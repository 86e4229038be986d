package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

// throwaway profiling main — not committed
object TmpProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = graft.Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
    emb.count()
    for (i <- 1 to 2) {
      var cb: Array[Array[Array[Double]]] = null
      time(s"pqCodebooks run$i") {
        cb = PipelineOps.pqCodebooks(emb, graft.Tables.embeddingDim, m = 8, codes = 64)
      }
      time(s"pqAnnTopK run$i") {
        PipelineOps.pqAnnTopK(emb, probes, k = 5, dim = graft.Tables.embeddingDim,
          codes = 64, refineFactor = 16, codebooks = Some(cb))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"cosineTopK run$i") {
        PipelineOps.cosineTopK(emb, probes, k = 5)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full q104 run$i") {
        SparkEntry.queries("q104_pq_ann")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
