package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] takes a `sfDir` (a scale-factor
  * directory such as `/root/testdata/sf0.01`) and reads single parquet
  * files from it. At cluster scale these would be directories of many
  * files — nothing here assumes single-file inputs.
  */
object Tables {
  /** Width of `embeddings.embedding` at every scale factor (TESTDATA.md).
    * Passed to the ANN operators so plan construction fires no probe job.
    */
  val embeddingDim = 64

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalized to epoch-nanosecond LongType regardless of the
    * physical parquet type. Earlier driver testdata stored timestamp[ns]
    * (surfaced as Long ns under `spark.sql.legacy.parquet.nanosAsLong`);
    * current testdata stores timestamp[us] (surfaced as TIMESTAMP_NTZ).
    * The query surface does exact integer-microsecond arithmetic on `ts`,
    * so both shapes fold to the same Long-ns column here. Sessions run in
    * UTC (Verify/Bench/specs all pin it), so the NTZ→timestamp cast is
    * value-exact.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(
            df.col("ts").cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
