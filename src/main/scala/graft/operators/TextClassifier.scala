package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A trained hashed-feature softmax text classifier (weights live on the
  * driver, broadcast into plans as literals). `width = dims + extraCount
  * + 1`: hashed token features first, engineered dense features next, the
  * intercept as the last feature (constant 1.0 — one code path for every
  * gradient cell).
  */
final case class TextClassifierModel(
    classes: IndexedSeq[String],
    dims: Int,
    extraCount: Int,
    weights: Array[Array[Double]], // [class][feature], width = dims + extraCount + 1
    lossHistory: IndexedSeq[Double])

/** fastText-style text classification, Spark-first — the classifier stage
  * every large-scale corpus pipeline runs (CCNet-style language ID /
  * quality filtering train exactly this shape: hashed bag-of-tokens plus
  * a few engineered signals into a linear softmax). The standard
  * bootstrap applies: label a corpus with a cheap heuristic, train this
  * model on the labels, and the model generalizes/replaces the heuristic
  * at scoring time.
  *
  * Training is full-batch gradient descent (heavy-ball momentum) where
  * the DATA never leaves the executors: each iteration ships the current
  * weights inside a codegen'd scoring expression
  * ([[graft.functions.SoftmaxProbsFromPairs]] — one fused loop per row),
  * scores every document, and ships back ONE job's worth of slim
  * (feature, class, long) cells — gradients, intercept included, plus a
  * single loss sentinel — bounded by `width × classes` after map-side
  * combine. Gradient and loss contributions are rounded to fixed-point
  * longs BEFORE the sum, so the aggregation is bit-exact under any
  * partitioning or ordering — a re-run on 1 or 1000 executors trains the
  * identical model (the same determinism-by-integer-arithmetic contract
  * as `trainingShuffle`). The momentum update happens driver-side on the
  * exact integer sums, so it inherits the determinism.
  *
  * Scale shape: per iteration exactly one Spark job, zero `collect()` of
  * row data. The featurized corpus is persisted once and reused across
  * iterations.
  */
object TextClassifier {

  private val GradScale = 1e9 // fixed-point gradient cells
  private val LossScale = 1e6 // fixed-point per-row log-loss

  /** Sparse feature pairs array<struct<i:int, v:double>>: distinct hashed
    * token indices in [0, dims) with weight 1/count (L1-normalized BoW),
    * each engineered feature at its reserved index, and the intercept
    * (dims + extraCount, constant 1.0) last. Engineered values are
    * NaN/null-scrubbed to 0 so one degenerate row can never poison the
    * gradient.
    */
  private def featPairs(textCol: Column, dims: Int, extras: Seq[Column]): Column = {
    val toks = array_distinct(transform(split(textCol, " "),
      t => pmod(xxhash64(t), lit(dims)).cast("int")))
    val tokPairs = transform(toks,
      i => struct(i.as("i"), (lit(1.0) / size(toks)).as("v")))
    val tail = extras.zipWithIndex.map { case (e, j) =>
      struct(lit(dims + j).cast("int").as("i"),
        coalesce(nanvl(e.cast("double"), lit(0.0)), lit(0.0)).as("v"))
    } :+ struct(lit(dims + extras.size).cast("int").as("i"), lit(1.0).as("v"))
    concat(tokPairs, array(tail: _*))
  }

  /** Per-row softmax probabilities: one codegen'd pass over the sparse
    * pairs against the literal weight matrix
    * ([[graft.functions.SoftmaxProbsFromPairs]] — bit-identical to the HOF
    * margins + stable-softmax formulation it replaced, minus the
    * interpreted-lambda re-evaluation that dominated scoring cost).
    */
  private def probsCol(pairs: Column, weights: Array[Array[Double]]): Column =
    graft.functions.SoftmaxProbsFromPairs.softmaxProbs(pairs, weights)

  def train(
      docs: DataFrame,
      labelCol: String,
      dims: Int = 64,
      iters: Int = 30,
      lr: Double = 16.0,
      momentum: Double = 0.9,
      textCol: String = "text",
      extraFeatures: Seq[Column] = Nil): TextClassifierModel = {
    require(dims > 0, s"dims must be positive, got $dims")
    require(iters > 0, s"iters must be positive, got $iters")
    require(momentum >= 0 && momentum < 1, s"momentum must be in [0,1), got $momentum")
    val width = dims + extraFeatures.size + 1
    // the class vocabulary is bounded by definition (it IS the model's
    // output space); sorted for a deterministic class order
    val classes = docs.select(col(labelCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted.toIndexedSeq
    require(classes.size >= 2, s"need >= 2 classes, got $classes")
    val k = classes.size
    val clsIdx: Map[String, Int] = classes.zipWithIndex.toMap
    val prepped = docs
      .select(
        element_at(typedlit(clsIdx), col(labelCol).cast("string")).as("_yi"),
        featPairs(col(textCol), dims, extraFeatures).as("_fp"))
      .persist()
    try {
      val n = prepped.count()
      require(n > 0, "train: empty corpus")
      val weights = Array.fill(k)(new Array[Double](width))
      val velocity = Array.fill(k)(new Array[Double](width))
      val losses = IndexedSeq.newBuilder[Double]
      for (_ <- 0 until iters) {
        // snapshot: the expression ships a reference, and `weights` mutates
        // after the collect below (the old typedlit copied implicitly)
        val scored = prepped
          .withColumn("_probs", probsCol(col("_fp"), weights.map(_.clone())))
          .withColumn("_err", transform(col("_probs"),
            (p, i) => p - when(i === col("_yi"), lit(1.0)).otherwise(lit(0.0))))
        // ONE job: gradient cells for every (feature incl. intercept,
        // class) plus the (-1, 0) loss sentinel, all fixed-point longs
        val cells = scored
          .select(explode(col("_fp")).as("_s"), col("_err"))
          .select(col("_s.i").as("_i"), col("_s.v").as("_v"), posexplode(col("_err")))
          .select(col("_i"), col("pos").as("_c"),
            round(col("col") * col("_v") * GradScale).cast("long").as("_g"))
          .union(scored.select(lit(-1).as("_i"), lit(0).as("_c"),
            round(-log(greatest(element_at(col("_probs"), col("_yi") + 1),
              lit(1e-12))) * LossScale).cast("long").as("_g")))
          .groupBy(col("_i"), col("_c")).agg(sum(col("_g")).as("_g"))
          .collect()
        cells.foreach { r =>
          val (i, c, g) = (r.getInt(0), r.getInt(1), r.getLong(2))
          if (i < 0) losses += g / LossScale / n
          else {
            velocity(c)(i) = momentum * velocity(c)(i) + (g / GradScale) / n
            weights(c)(i) -= lr * velocity(c)(i)
          }
        }
      }
      TextClassifierModel(classes, dims, extraFeatures.size, weights,
        losses.result())
    } finally { prepped.unpersist(); () }
  }

  /** Persist a trained model as a one-row parquet file (exact double
    * round-trip, no hand-rolled serialization — the PqIndex `_meta`
    * convention). Train once, score any number of later corpora.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: TextClassifierModel, path: String): Unit = {
    import spark.implicits._
    Seq((model.classes, model.dims, model.extraCount,
        model.weights.map(_.toSeq).toSeq, model.lossHistory))
      .toDF("classes", "dims", "extra_count", "weights", "loss_history")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): TextClassifierModel = {
    val df = spark.read.parquet(path)
    val r = df.head()
    def idx(n: String) = df.schema.fieldIndex(n)
    TextClassifierModel(
      r.getSeq[String](idx("classes")).toIndexedSeq,
      r.getInt(idx("dims")),
      r.getInt(idx("extra_count")),
      r.getSeq[scala.collection.Seq[Double]](idx("weights")).map(_.toArray).toArray,
      r.getSeq[Double](idx("loss_history")).toIndexedSeq)
  }

  /** Score rows with a trained model: appends `pred_label` (argmax class,
    * ties break to the lower class index — `array_position` finds the
    * FIRST index holding the max) and `confidence` (its softmax
    * probability). `extraFeatures` must be the SAME expressions training
    * used, in the same order. One codegen'd scoring pass per row over
    * literal weights — no shuffle, no join, no UDF.
    */
  def classify(
      docs: DataFrame,
      model: TextClassifierModel,
      textCol: String = "text",
      extraFeatures: Seq[Column] = Nil): DataFrame = {
    require(extraFeatures.size == model.extraCount,
      s"model was trained with ${model.extraCount} extra features, got ${extraFeatures.size}")
    val pairs = featPairs(col(textCol), model.dims, extraFeatures)
    val probs = probsCol(pairs, model.weights)
    val conf = array_max(probs)
    docs
      .withColumn("pred_label",
        element_at(typedlit(model.classes), array_position(probs, conf).cast("int")))
      .withColumn("confidence", conf)
  }
}
