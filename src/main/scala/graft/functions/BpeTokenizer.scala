package graft.functions

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich-style merges over character
  * symbols), pure JVM and fully deterministic — the real-tokenizer
  * counterpart to the regex token ESTIMATE in
  * `PipelineOps.withTokenCounts`.
  *
  * Determinism contract (what lets q106's oracle assert invariants and a
  * re-run reproduce identical ids): training counts pairs over a caller
  * -fixed sample, each round merges the most frequent pair with ties
  * broken lexicographically; encoding greedily applies the LOWEST-rank
  * mergeable pair, ties broken leftmost. No RNG, no hash iteration
  * order anywhere (sorted maps at the decision points).
  *
  * Round-trip exactness for ANY text: the input is pre-tokenized into
  * alternating whitespace / non-whitespace runs and each run is encoded
  * independently, so concatenating the emitted tokens reproduces the
  * original string byte-for-byte (merges are only learned over
  * non-whitespace runs; a whitespace run is always a single token).
  *
  * Scale shape: training is a bounded-sample, single-node job (every
  * production tokenizer trains on a sample); the MODEL — a rank map of a
  * few thousand merges — broadcasts to executors, and encoding is a
  * per-row pure function, embarrassingly parallel with no shuffle.
  */
object BpeTokenizer {

  /** Learned model: merge list in creation order; `ranks` maps a mergeable
    * symbol pair to its priority (lower = earlier-learned = applied first).
    */
  final case class Model(merges: Vector[(String, String)]) extends Serializable {
    @transient lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Persist a trained model as a one-row parquet file (merge list in
    * creation order — the whole model). Train once on a bounded sample,
    * tokenize any number of later corpora with the identical vocabulary.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    Seq(Tuple1(model.merges.map { case (a, b) => Seq(a, b) }))
      .toDF("merges")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model =
    Model(spark.read.parquet(path).head()
      .getSeq[scala.collection.Seq[String]](0)
      .map(p => (p(0), p(1))).toVector)

  /** Split into alternating non-ws / ws runs; concatenation reproduces the
    * input exactly.
    */
  private[graft] def runs(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val ws = Character.isWhitespace(text.charAt(i))
      var j = i + 1
      while (j < n && Character.isWhitespace(text.charAt(j)) == ws) j += 1
      out += text.substring(i, j)
      i = j
    }
    out.result()
  }

  /** Train `numMerges` merges from sample texts (word-frequency weighted,
    * classic BPE). Deterministic: ties on pair count break lexicographic.
    */
  def train(sample: Iterable[String], numMerges: Int): Model = {
    // word -> frequency, over non-whitespace runs only
    val wordFreq = mutable.HashMap.empty[String, Long]
    sample.foreach { t =>
      runs(t).foreach { r =>
        if (r.nonEmpty && !Character.isWhitespace(r.charAt(0)))
          wordFreq.updateWith(r) { c => Some(c.getOrElse(0L) + 1L) }
      }
    }
    trainFromCounts(wordFreq.toSeq, numMerges)
  }

  /** CORPUS-SCALE training: word frequencies come from ONE distributed
    * aggregation over the whole corpus (map-side-combined `groupBy` of
    * slim (word, count) pairs — the only thing that shuffles), capped to
    * the `maxVocab` most frequent distinct words (count-desc, word-asc —
    * deterministic), and the classic Sennrich merge loop then runs
    * driver-side over that bounded distinct-word table. This is the
    * count-then-merge-locally recipe production tokenizers use: the
    * corpus is touched exactly once regardless of merge count, the
    * driver holds O(maxVocab) state, and the resulting few-KB model
    * broadcasts for per-row encoding. Identical tie-breaks to [[train]],
    * so a local sample run and a distributed run agree whenever their
    * counts do.
    */
  def trainDistributed(
      spark: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 100000): Model = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val freq = docs.select(col(textCol).as("t")).na.drop().as[String]
      .flatMap(t => runs(t).iterator
        .filter(r => r.nonEmpty && !Character.isWhitespace(r.charAt(0))))
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(freq, numMerges)
  }

  /** Sennrich merge loop over an aggregated (distinct word, frequency)
    * table, with INCREMENTAL pair maintenance (the classic optimization
    * from the original subword-nmt implementation): each round updates
    * counts only for the words that actually contain the merged pair,
    * instead of recounting the whole vocabulary — O(argmin scan +
    * affected words) per merge rather than O(vocab symbols). Counts after
    * every round are identical to a full recount (pure add/subtract of
    * the same occurrence×frequency terms), and the argmin's total order
    * (-count, pair) is iteration-order-independent, so the learned model
    * is bit-identical to the naive loop's.
    */
  def trainFromCounts(wordFreq: Seq[(String, Long)], numMerges: Int): Model = {
    // each distinct word as a mutable symbol sequence
    val sorted = wordFreq.toArray.sortBy(_._1)
    val words: Array[Array[String]] = sorted.map(_._1.toCharArray.map(_.toString))
    val freqs: Array[Long] = sorted.map(_._2)

    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]

    def tally(wi: Int, sign: Long): Unit = {
      val syms = words(wi)
      val f = freqs(wi) * sign
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = pairCounts.getOrElse(p, 0L) + f
        if (c == 0L) {
          pairCounts.remove(p)
          pairWords.remove(p)
        } else {
          pairCounts(p) = c
          if (sign > 0) pairWords.getOrElseUpdate(p, mutable.HashSet.empty) += wi
        }
        i += 1
      }
      if (sign < 0) {
        // drop this word's membership from every pair it used to carry
        // (surviving pairs keep other members exact)
        i = 0
        while (i < syms.length - 1) {
          pairWords.get((syms(i), syms(i + 1))).foreach { s =>
            s -= wi
            if (s.isEmpty) { pairWords.remove((syms(i), syms(i + 1))) }
          }
          i += 1
        }
      }
    }

    var wi = 0
    while (wi < words.length) { tally(wi, 1L); wi += 1 }

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges && pairCounts.nonEmpty) {
      // max count, ties lexicographic-smallest pair: deterministic under
      // any map iteration order (strict total order on (-count, pair))
      var best: (String, String) = null
      var bestCount = Long.MinValue
      pairCounts.foreach { case (p, c) =>
        if (c > bestCount || (c == bestCount &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCount = c
        }
      }
      merges += best
      val affected = pairWords.get(best).map(_.toArray).getOrElse(Array.empty)
      var k = 0
      while (k < affected.length) {
        val w = affected(k)
        tally(w, -1L)
        words(w) = mergePair(words(w), best._1, best._2)
        tally(w, 1L)
        k += 1
      }
      // defensive: the merged pair must be gone (every carrier rewrote)
      pairCounts.remove(best)
      pairWords.remove(best)
      m += 1
    }
    Model(merges.result())
  }

  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one non-whitespace run. Semantics (GPT-2 style, unchanged
    * since the first round this shipped): repeatedly pick the
    * LOWEST-rank pair present anywhere in the run and merge ALL its
    * occurrences in one left-to-right pass, until no ranked pair
    * remains.
    *
    * Implementation is a doubly-linked symbol list + lazy rank
    * priority queue with per-pair occurrence sets — O(len log len)
    * instead of the scan-all-merge-one O(len²) loop this replaced
    * (which survives as [[encodeRunReference]] for the equivalence
    * spec). Bit-identical output: within a pass, merging occurrence i
    * can never CREATE a new occurrence of the same pair (the merged
    * symbol `a+b` is strictly longer than `a` and `b`, so neither
    * neighbor pair can equal `(a,b)` again), and overlapping
    * occurrences ("aaa" with (a,a)) die the same way the left-to-right
    * scan kills them — the right element is no longer alive.
    */
  private[graft] def encodeRun(run: String, ranks: Map[(String, String), Int]): Vector[String] = {
    val n = run.length
    if (n == 0) return Vector.empty
    if (n == 1) return Vector(run)
    // linked list over positions 0..n-1; merged symbol replaces the left slot
    val sym = new Array[String](n)
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    var i = 0
    while (i < n) {
      sym(i) = String.valueOf(run.charAt(i))
      nxt(i) = if (i == n - 1) -1 else i + 1
      prv(i) = i - 1
      i += 1
    }
    // rank -> ordered positions of live occurrences of that rank's pair
    val occ = new java.util.HashMap[Int, java.util.TreeSet[Integer]]()
    // lazy min-heap of ranks with (possibly stale) occurrences
    val pq = new java.util.PriorityQueue[Integer]()
    // the model's merge list, addressable by rank for pq pops
    val byRank = new java.util.HashMap[Int, (String, String)]()

    def addOcc(p: Int): Unit = {
      val q = nxt(p)
      if (q >= 0) {
        val pair = (sym(p), sym(q))
        val r = ranks.getOrElse(pair, -1)
        if (r >= 0) {
          var s = occ.get(r)
          if (s == null) { s = new java.util.TreeSet[Integer](); occ.put(r, s); byRank.put(r, pair) }
          if (s.isEmpty) pq.add(r)
          s.add(p)
        }
      }
    }
    def removeOcc(p: Int): Unit = {
      val q = nxt(p)
      if (q >= 0) {
        val r = ranks.getOrElse((sym(p), sym(q)), -1)
        if (r >= 0) {
          val s = occ.get(r)
          if (s != null) s.remove(Integer.valueOf(p))
        }
      }
    }

    i = 0
    while (i < n - 1) { addOcc(i); i += 1 }

    while (!pq.isEmpty) {
      val r = pq.poll()
      val s = occ.get(r)
      if (s != null && !s.isEmpty) {
        val (a, b) = byRank.get(r)
        // one left-to-right pass over all occurrences of this pair
        while (!s.isEmpty) {
          val p = s.pollFirst().intValue()
          val q = nxt(p)
          // validity: an earlier merge in this pass may have consumed q
          if (q >= 0 && sym(p) == a && sym(q) == b) {
            // retract neighbor occurrences recorded against the old symbols
            if (prv(p) >= 0) removeOcc(prv(p))
            removeOcc(q)
            // splice: merged symbol lives at p, q dies (q is never the
            // head — it has predecessor p — so head stays at 0)
            sym(p) = a + b
            val qn = nxt(q)
            nxt(p) = qn
            if (qn >= 0) prv(qn) = p
            sym(q) = null
            // record neighbor occurrences against the new symbol
            if (prv(p) >= 0) addOcc(prv(p))
            addOcc(p)
          }
        }
      }
    }

    val out = Vector.newBuilder[String]
    var p = 0
    while (p >= 0) { out += sym(p); p = nxt(p) }
    out.result()
  }

  /** The original O(len²) scan-all-merge-one-pair loop, kept ONLY as the
    * oracle for [[BpeTokenizerSpec]]'s equivalence property — the fast
    * [[encodeRun]] must match it token-for-token on any input.
    */
  private[graft] def encodeRunReference(run: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = run.toCharArray.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = mergePair(syms, syms(bestAt), syms(bestAt + 1))
    }
    syms.toVector
  }

  /** Tokenize: whitespace runs pass through as single tokens, so
    * `tokens.mkString == text` always holds (the q106 round-trip oracle).
    */
  def encode(text: String, model: Model): Vector[String] = {
    val rk = model.ranks
    runs(text).flatMap { r =>
      if (r.isEmpty || Character.isWhitespace(r.charAt(0))) Vector(r)
      else encodeRun(r, rk)
    }
  }

  def decode(tokens: Seq[String]): String = tokens.mkString
}
