package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate flowing into [[TopKByScore]]. */
case class ScoredNeighbor(score: Double, id: Long)

/** Typed top-k aggregator: keeps the k highest-scoring neighbors (ties →
  * smaller id), ordered best-first.
  *
  * The point is the SHUFFLE SHAPE: `Window.partitionBy(probe).orderBy(score)`
  * moves every scored pair to the reducer before ranking — O(corpus ×
  * probes) shuffle rows for a brute-force scorer. As an `Aggregator`,
  * Spark runs partial aggregation map-side, so each task ships at most k
  * rows per probe — the shuffle shrinks from the candidate count to
  * O(k × tasks × probes) regardless of corpus size.
  *
  * Buffers stay tiny (≤ k elements, insertion keeps them sorted), so the
  * per-row cost is O(k) with zero allocation churn beyond the buffer list.
  */
class TopKByScore(k: Int) extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: ScoredNeighbor, b: ScoredNeighbor): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(buf: Seq[ScoredNeighbor], a: ScoredNeighbor): Seq[ScoredNeighbor] =
    if (buf.size >= k && better(buf.last, a)) buf
    else {
      val i = buf.indexWhere(b => better(a, b)) match {
        case -1 => buf.size
        case x => x
      }
      val grown = (buf.take(i) :+ a) ++ buf.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }

  override def merge(x: Seq[ScoredNeighbor], y: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    y.foldLeft(x)(reduce)

  override def finish(r: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = r

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] = ExpressionEncoder()
}

object TopK {

  /** `top_k(score, id)` aggregate Column: array of the k best (score, id)
    * structs, best first. Partial-aggregates map-side — see [[TopKByScore]].
    */
  def topKByScore(k: Int, score: Column, id: Column): Column =
    udaf(new TopKByScore(k), Encoders.product[ScoredNeighbor]).apply(score, id)
}
