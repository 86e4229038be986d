package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hashed-feature softmax classifier: learns a separable vocabulary,
  * trains bit-identically on re-runs (fixed-point gradient cells), and
  * degrades loss monotonically enough to assert first > last.
  */
class TextClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three classes with disjoint vocabularies + shared filler tokens. */
  private def corpus(n: Int) = {
    val vocab = Map(
      "red" -> Seq("crimson", "scarlet", "ruby", "maroon"),
      "green" -> Seq("emerald", "lime", "olive", "jade"),
      "blue" -> Seq("azure", "navy", "cobalt", "teal"))
    (0 until n).flatMap { i =>
      vocab.toSeq.sortBy(_._1).map { case (cls, words) =>
        val w1 = words(i % words.size)
        val w2 = words((i / words.size) % words.size)
        (s"$cls-$i", cls, s"the $w1 filler $w2 common words here $w1")
      }
    }.toDF("doc_id", "label", "text")
  }

  test("learns a separable vocabulary to 100% holdout accuracy, loss decreases") {
    val train = corpus(40)
    val holdout = corpus(60).filter($"doc_id".endsWith("7")) // unseen combos
    val model = TextClassifier.train(train, labelCol = "label",
      dims = 64, iters = 20, lr = 4.0)
    assert(model.classes == IndexedSeq("blue", "green", "red"))
    assert(model.lossHistory.head > model.lossHistory.last,
      s"loss must decrease: ${model.lossHistory.head} -> ${model.lossHistory.last}")
    val scored = TextClassifier.classify(holdout, model)
    val wrong = scored.filter($"pred_label" =!= $"label").count()
    assert(wrong == 0L, s"$wrong holdout misclassifications")
    // confidence is a probability and the argmax one
    val bad = scored.filter($"confidence" <= 1.0 / 3.0 - 1e-9 || $"confidence" > 1.0).count()
    assert(bad == 0L)
  }

  test("training is bit-deterministic across runs and repartitionings") {
    val base = corpus(25)
    val m1 = TextClassifier.train(base, labelCol = "label", dims = 32, iters = 5)
    val m2 = TextClassifier.train(base.repartition(7), labelCol = "label",
      dims = 32, iters = 5)
    assert(m1.lossHistory == m2.lossHistory)
    assert(m1.weights.map(_.toSeq).toSeq == m2.weights.map(_.toSeq).toSeq)
  }

  test("save/load round-trips the model bit-exactly") {
    val m = TextClassifier.train(corpus(20), labelCol = "label", dims = 32, iters = 4)
    val path = java.nio.file.Files.createTempDirectory("clf_model").toString + "/m.parquet"
    TextClassifier.save(spark, m, path)
    val l = TextClassifier.load(spark, path)
    assert(l.classes == m.classes && l.dims == m.dims && l.extraCount == m.extraCount)
    assert(l.weights.map(_.toSeq).toSeq == m.weights.map(_.toSeq).toSeq)
    assert(l.lossHistory == m.lossHistory)
    val docs = corpus(5)
    val a = TextClassifier.classify(docs, m).select($"doc_id", $"pred_label")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = TextClassifier.classify(docs, l).select($"doc_id", $"pred_label")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b)
  }

  test("rejects degenerate inputs") {
    val one = Seq(("a", "only", "some text")).toDF("doc_id", "label", "text")
    intercept[IllegalArgumentException] {
      TextClassifier.train(one, labelCol = "label", dims = 16, iters = 1)
    }
  }
}
