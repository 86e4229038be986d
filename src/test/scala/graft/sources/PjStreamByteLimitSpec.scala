package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadLimit}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjMicroBatchStream, PjStreamInfo, PjWriter}

/** `maxBytesPerTrigger` (Delta parity): soft per-batch byte cap on the
  * streaming source — files admit in (mtime, path) order until the next one
  * would cross the cap, always at least one so an oversized file still makes
  * progress. Composes with `maxFilesPerTrigger` (whichever cap binds first).
  */
class PjStreamByteLimitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkStream(dir: String, ckpt: String,
      maxFiles: Option[Int] = None, maxBytes: Option[Long] = None) = {
    spark.sparkContext
    new PjMicroBatchStream(
      PjStreamInfo(dir, autogen = true, mergeSchema = false,
        maxFilesPerTrigger = maxFiles, maxBytesPerTrigger = maxBytes),
      new StructType(), new StructType(), new StructType(), new StructType(),
      Nil, Nil, ckpt)
  }

  private def mkFile(dir: String, name: String, bytes: Int): Unit =
    Files.write(Paths.get(dir, name), Array.fill[Byte](bytes)(1))

  private def batch(ckpt: String, id: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(Paths.get(ckpt, "pjfilelog", id.toString)).asScala.toSeq
  }

  test("soft byte cap: batches stop before crossing, oversized single file still admits") {
    val dir = Files.createTempDirectory("pj_bytes").toString
    val ckpt = Files.createTempDirectory("pj_bytes_ckpt").toString
    // path order = admission order (one mtime tick)
    mkFile(dir, "a.parquet", 100)
    mkFile(dir, "b.parquet", 100)
    mkFile(dir, "c.parquet", 100)
    mkFile(dir, "d.parquet", 1000) // alone over any 250-byte cap
    mkFile(dir, "e.parquet", 100)
    val s = mkStream(dir, ckpt, maxBytes = Some(250L))
    val o1 = s.latestOffset(s.initialOffset(), ReadLimit.maxBytes(250L))
    assert(batch(ckpt, 0).size == 2 &&
      batch(ckpt, 0).exists(_.contains("a.parquet")) &&
      batch(ckpt, 0).exists(_.contains("b.parquet")),
      s"first batch = 2×100 bytes: ${batch(ckpt, 0)}")
    val o2 = s.latestOffset(o1, ReadLimit.maxBytes(250L))
    assert(batch(ckpt, 1).size == 1 && batch(ckpt, 1).head.contains("c.parquet"),
      s"second batch stops before d (1000B would cross): ${batch(ckpt, 1)}")
    val o3 = s.latestOffset(o2, ReadLimit.maxBytes(250L))
    assert(batch(ckpt, 2).size == 1 && batch(ckpt, 2).head.contains("d.parquet"),
      "an oversized single file must still admit (progress guarantee)")
    val o4 = s.latestOffset(o3, ReadLimit.maxBytes(250L))
    assert(batch(ckpt, 3).size == 1 && batch(ckpt, 3).head.contains("e.parquet"))
    assert(s.latestOffset(o4, ReadLimit.maxBytes(250L)).json() == o4.json(), "drained")
  }

  test("composes with maxFilesPerTrigger: whichever cap binds first ends the batch") {
    val dir = Files.createTempDirectory("pj_bytes_comp").toString
    val ckpt = Files.createTempDirectory("pj_bytes_comp_ckpt").toString
    (0 until 4).foreach(i => mkFile(dir, s"f$i.parquet", 10))
    val s = mkStream(dir, ckpt, maxFiles = Some(3), maxBytes = Some(1000L))
    val limit = s.getDefaultReadLimit
    assert(limit.isInstanceOf[CompositeReadLimit], s"both caps declared: $limit")
    // bytes would allow all 4; the file cap binds at 3
    s.latestOffset(s.initialOffset(), limit)
    assert(batch(ckpt, 0).size == 3, s"file cap binds: ${batch(ckpt, 0)}")
    // byte cap binds when tighter: 2×10 fits, the third would cross 25
    val ckpt2 = Files.createTempDirectory("pj_bytes_comp2_ckpt").toString
    val s2 = mkStream(dir, ckpt2, maxFiles = Some(3), maxBytes = Some(25L))
    assert(s2.getDefaultReadLimit.isInstanceOf[CompositeReadLimit])
    s2.latestOffset(s2.initialOffset(), s2.getDefaultReadLimit)
    assert(batch(ckpt2, 0).size == 2, s"byte cap binds: ${batch(ckpt2, 0)}")
  }

  test("end-to-end: a 1-byte cap drains a 6-file backlog as 6 single-file batches") {
    val dir = Files.createTempDirectory("pj_bytes_e2e").toString
    val ckpt = Files.createTempDirectory("pj_bytes_e2e_ckpt").toString
    PjWriter.writeWithIndex(
      spark.range(0, 600).select($"id", ($"id" % 6).as("b")).repartition(6), dir)
    val q = spark.readStream.format("pjparquet")
      .option("maxBytesPerTrigger", "1")
      .load(dir)
      .writeStream.format("memory").queryName("pj_bytes_e2e_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
    val out = spark.table("pj_bytes_e2e_out")
    assert(out.count() == 600L)
    assert(out.select($"id").distinct().count() == 600L)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 6,
      s"soft cap admits exactly one file per batch: ${batches.map(_.numInputRows).mkString(",")}")
  }
}
