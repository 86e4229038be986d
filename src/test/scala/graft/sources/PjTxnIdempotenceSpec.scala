package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjCommitLog

/** Idempotent writer commits (`txnAppId`/`txnVersion`, Delta's
  * SetTransaction parity): a batch write declaring a transaction identity
  * is recorded in the commit log's txn lane; replaying the same identity
  * — a retried `foreachBatch` micro-batch, a restarted batch job — is a
  * metadata-rate no-op that leaves no staged files behind. The lane
  * survives checkpoints, RESTORE, and concurrent same-appId writers.
  */
class PjTxnIdempotenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    java.nio.file.Files.delete(dir)
    dir.toString
  }

  private def snap(t: String): PjCommitLog.Snapshot = {
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    PjCommitLog.latest(fs, root).get
  }

  private def write(t: String, ids: Seq[Long], app: String, ver: Long): Unit =
    ids.map(i => (i, i * 10)).toDF("id", "v").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true")
      .option("txnAppId", app).option("txnVersion", ver.toString)
      .save(t)

  private def dataFiles(t: String): Seq[String] =
    Option(new java.io.File(t).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getName)

  test("replayed batch is a no-op: counts exact, version unchanged, no orphan files") {
    val t = freshDir("pj_txn_replay")
    write(t, Seq(1L, 2L, 3L), "loader", 1L)
    val v1 = snap(t).version
    assert(snap(t).txnVersion("loader").contains(1L))
    // the replay: same identity, same (or different!) rows — must not land
    write(t, Seq(1L, 2L, 3L), "loader", 1L)
    assert(snap(t).version == v1, "replay must not claim a version")
    assert(spark.read.format("pjparquet").load(t).count() == 3L)
    assert(dataFiles(t).size == snap(t).files.size,
      s"replay left orphan staged files: ${dataFiles(t)}")
    // the NEXT version for the same app proceeds normally
    write(t, Seq(4L, 5L), "loader", 2L)
    assert(snap(t).version == v1 + 1)
    assert(spark.read.format("pjparquet").load(t).count() == 5L)
    assert(snap(t).txnVersion("loader").contains(2L))
  }

  test("restart-replay of an OLDER version is also a no-op (max-wins watermark)") {
    val t = freshDir("pj_txn_older")
    write(t, Seq(1L), "app", 1L)
    write(t, Seq(2L), "app", 2L)
    write(t, Seq(3L), "app", 3L)
    // restarted job re-emits batch 2: below the recorded watermark → skip
    write(t, Seq(2L), "app", 2L)
    assert(spark.read.format("pjparquet").load(t).count() == 3L)
    assert(snap(t).txnVersion("app").contains(3L))
  }

  test("independent appIds do not interfere") {
    val t = freshDir("pj_txn_apps")
    write(t, Seq(1L), "a", 5L)
    write(t, Seq(2L), "b", 1L)
    write(t, Seq(3L), "b", 5L) // b's 5 is fresh even though a recorded 5
    assert(spark.read.format("pjparquet").load(t).count() == 3L)
    assert(snap(t).txnVersion("a").contains(5L))
    assert(snap(t).txnVersion("b").contains(5L))
  }

  test("txn lane survives a checkpoint (replay from checkpoint base)") {
    val t = freshDir("pj_txn_ckpt")
    write(t, Seq(1L), "etl", 7L)
    val root = new Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val v = PjCommitLog.latest(fs, root).get.version
    PjCommitLog.writeCheckpoint(fs, root, v)
    // drop every cached snapshot so the next read replays from disk
    PjCommitLog.clearSnapshotCache()
    assert(snap(t).txnVersion("etl").contains(7L),
      "checkpoint must carry the accumulated txn lane")
    write(t, Seq(1L), "etl", 7L) // replay across the checkpoint boundary
    assert(spark.read.format("pjparquet").load(t).count() == 1L)
  }

  test("txn lane survives RESTORE: a replayed batch stays a no-op after rollback") {
    val t = freshDir("pj_txn_restore")
    spark.conf.set("spark.sql.catalog.pjtxn", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjtxn.`$t` (id BIGINT, v BIGINT) USING pjparquet")
    write(t, Seq(1L, 2L), "feed", 1L)
    val vAfterBatch1 = snap(t).version
    write(t, Seq(3L, 4L), "feed", 2L)
    spark.sql(s"CALL pjtxn.system.restore('$t', $vAfterBatch1)")
    assert(spark.table(s"pjtxn.`$t`").count() == 2L, "restore rolled data back")
    // the application already considers batch 2 delivered — blind replay
    // must NOT double-deliver it post-restore
    write(t, Seq(3L, 4L), "feed", 2L)
    assert(spark.table(s"pjtxn.`$t`").count() == 2L,
      "txn watermark must survive RESTORE")
    assert(snap(t).txnVersion("feed").contains(2L))
  }

  test("concurrent same-appId writers: exactly one lands") {
    val t = freshDir("pj_txn_race")
    write(t, Seq(0L), "seed", 1L) // establish the log
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { i =>
      val th = new Thread(() =>
        try write(t, Seq(100L + i), "racer", 1L)
        catch { case e: Throwable => failures.add(e) })
      th.start(); th
    }
    threads.foreach(_.join())
    assert(failures.isEmpty, s"racing writers must not fail: ${failures.peek()}")
    val n = spark.read.format("pjparquet").load(t).count()
    assert(n == 2L, s"exactly one racer may land (seed + 1 winner), got $n rows")
    assert(dataFiles(t).size == snap(t).files.size,
      s"losers left orphan staged files: ${dataFiles(t)}")
  }

  test("foreachBatch wiring: batchId as txnVersion makes a replayed micro-batch exactly-once") {
    // the canonical production pattern: the sink writes each micro-batch
    // with txnAppId = a stable query identity and txnVersion = batchId;
    // a restart that re-fires the last batch (checkpoint lag) re-invokes
    // the SAME (appId, batchId) and must land nothing twice
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val t = freshDir("pj_txn_feb")
    spark.sql(s"CREATE TABLE pjtxn_feb_probe (x INT) USING parquet") // warm catalog, unrelated
    spark.sql("DROP TABLE pjtxn_feb_probe")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
      df.selectExpr("value AS id", "value * 10 AS v")
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true")
        .option("txnAppId", "feb-query").option("txnVersion", batchId.toString)
        .save(t)
    val q = in.toDF().writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$t-ckpt")
      .foreachBatch(writeBatch _)
      .start()
    in.addData(1L, 2L, 3L)
    q.awaitTermination(60000)
    assert(spark.read.format("pjparquet").load(t).count() == 3L)
    // the restart-replay: the engine re-fires the last batch's function
    // with the same batchId — exactly the double-write window
    writeBatch(Seq(1L, 2L, 3L).toDF("value"), 0L)
    assert(spark.read.format("pjparquet").load(t).count() == 3L,
      "replayed foreachBatch batch must be a no-op")
    assert(snap(t).txnVersion("feb-query").contains(0L))
  }

  test("refusals: non-log table, half an identity, streaming sink") {
    val t = freshDir("pj_txn_refuse")
    // directory-mode table (no commit log) has nowhere to record identity
    Seq((1L, 1L)).toDF("id", "v").write.parquet(t)
    val e1 = intercept[Exception] {
      Seq((2L, 2L)).toDF("id", "v").write.format("pjparquet").mode("append")
        .option("txnAppId", "x").option("txnVersion", "1").save(t)
    }
    assert(e1.getMessage.contains("commit-log"), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq((3L, 3L)).toDF("id", "v").write.format("pjparquet").mode("append")
        .option("txnAppId", "x").save(t)
    }
    assert(e2.getMessage.contains("together"), e2.getMessage)
  }
}
