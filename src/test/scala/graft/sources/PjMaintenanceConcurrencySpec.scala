package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjClone, PjCommitLog, PjCompaction, PjRestore}

/** Maintenance commits (compaction, OPTIMIZE ZORDER, clone
  * materialization, restore) race row-changing DML and appends: the
  * snapshot-read-to-commit window of a long-running rewrite must be
  * validated against every winner, not just the version-claim instant.
  *
  * The format's own contracts under test:
  *  - a DV DELETE landing mid-compaction is NEVER silently undone
  *    (deleted rows must not resurrect through the rewrite);
  *  - a CoW rewrite landing mid-compaction is NEVER doubled (the
  *    consumed file's rows must not land twice);
  *  - winners that only ADDED files rebase — a busy append stream never
  *    livelocks maintenance;
  *  - a writer racing RESTORE either lands visibly at HEAD or the
  *    restore conflicts loudly (never silently dropped).
  *
  * The race window is injected via [[PjCompaction.testHookBeforeCommit]],
  * the seam between the rewrite's publish and its commit.
  */
class PjMaintenanceConcurrencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fsOf(dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Arm the maintenance seam with a ONE-SHOT action (self-disarms, so a
    * retried commit loop runs it exactly once); always reset after.
    */
  private def oneShot(action: => Unit): Unit =
    PjCompaction.testHookBeforeCommit = { () =>
      PjCompaction.testHookBeforeCommit = () => ()
      action
    }

  private def resetHook(): Unit =
    PjCompaction.testHookBeforeCommit = () => ()

  /** Every data file on disk is referenced by SOME retained version (no
    * published-but-uncommitted orphans survive a conflicted rewrite;
    * files retired for time travel are legitimately present).
    */
  private def noOrphans(dir: String): Unit = {
    val (fs, root) = fsOf(dir)
    val live = PjCommitLog.versions(fs, root)
      .flatMap(v => PjCommitLog.read(fs, root, v).files).toSet
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")) {
        val rel = PjCommitLog.relativize(fs, root, s.getPath)
        if (!graft.sources.pjparquet.PjBatchWrite.isInternalRel(rel) &&
            !rel.startsWith("_pj_log/"))
          assert(live.contains(rel), s"orphan data file survived the conflict: $rel")
      }
    }
  }

  test("DV DELETE landing mid-compaction: loud conflict, deleted rows never resurrect") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_dv").toString
    spark.range(0, 200).select($"id", ($"id" % 10).as("m"))
      .repartition(4).write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(dir) // v1: 4 small files
    spark.sql("DROP TABLE IF EXISTS pj_mc_dv")
    spark.sql(s"CREATE TABLE pj_mc_dv USING pjparquet OPTIONS (path '$dir')")

    // the DELETE lands INSIDE compaction's read-to-commit window
    oneShot(spark.sql("DELETE FROM pj_mc_dv WHERE m = 3"))
    try {
      val e = intercept[PJException](PjCompaction.compact(spark, dir))
      assert(e.getMessage.contains("version conflict"), e.getMessage)
      assert(e.getMessage.contains("maintenance"), e.getMessage)
    } finally resetHook()

    // the delete stands: rows never resurrect through the dead rewrite
    assert(spark.table("pj_mc_dv").filter($"m" === 3).count() == 0L)
    assert(spark.table("pj_mc_dv").count() == 180L)
    noOrphans(dir)

    // a retry against the new state succeeds and MATERIALIZES the vector
    val r = PjCompaction.compact(spark, dir)
    assert(r.compactedInto >= 1)
    assert(spark.table("pj_mc_dv").filter($"m" === 3).count() == 0L)
    assert(spark.table("pj_mc_dv").count() == 180L)
    val (fs, root) = fsOf(dir)
    assert(PjCommitLog.latest(fs, root).get.entries.forall(_.dv.isEmpty),
      "retried compaction must materialize the vector away")
  }

  test("CoW UPDATE landing mid-compaction: loud conflict, rows never double") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_cow").toString
    spark.range(0, 100).select($"id", lit(1L).as("v"))
      .repartition(3).write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(dir)
    spark.sql("DROP TABLE IF EXISTS pj_mc_cow")
    spark.sql(s"CREATE TABLE pj_mc_cow USING pjparquet OPTIONS " +
      s"(path '$dir', `deletionVectors.enabled` 'false')") // UPDATE = CoW rewrite

    oneShot(spark.sql("UPDATE pj_mc_cow SET v = 2 WHERE id < 50"))
    try {
      val e = intercept[PJException](PjCompaction.compact(spark, dir))
      assert(e.getMessage.contains("version conflict"), e.getMessage)
    } finally resetHook()

    // the update stands exactly once: no duplicated rows, values exact
    assert(spark.table("pj_mc_cow").count() == 100L)
    assert(spark.table("pj_mc_cow").filter($"v" === 2).count() == 50L)
    noOrphans(dir)

    val r = PjCompaction.compact(spark, dir)
    assert(r.compactedInto >= 1)
    assert(spark.table("pj_mc_cow").count() == 100L)
    assert(spark.table("pj_mc_cow").filter($"v" === 2).count() == 50L)
  }

  test("pure append landing mid-compaction REBASES: both land, nothing lost") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_app").toString
    def append(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).toDF("id").coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(dir)
    append(0, 50); append(50, 100) // two small files

    oneShot(append(100, 150)) // winner adds a file, touches nothing consumed
    try {
      val r = PjCompaction.compact(spark, dir) // must NOT throw
      assert(r.smallFiles == 2)
    } finally resetHook()

    val df = spark.read.format("pjparquet").load(dir)
    assert(df.count() == 150L, "the racing append and the compaction both land")
    assert(df.agg(org.apache.spark.sql.functions.sum($"id")).head().getLong(0) ==
      (0L until 150L).sum)
    val (fs, root) = fsOf(dir)
    val head = PjCommitLog.latest(fs, root).get
    assert(head.action == "compact")
  }

  test("OPTIMIZE ZORDER racing a DV DELETE: loud conflict, delete stands") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_zo").toString
    spark.range(0, 300).select($"id", ($"id" % 7).as("a"), ($"id" % 11).as("b"))
      .repartition(3).write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(dir)
    spark.sql("DROP TABLE IF EXISTS pj_mc_zo")
    spark.sql(s"CREATE TABLE pj_mc_zo USING pjparquet OPTIONS (path '$dir')")

    oneShot(spark.sql("DELETE FROM pj_mc_zo WHERE a = 5"))
    try {
      val e = intercept[PJException](
        PjCompaction.optimize(spark, dir, Seq("a", "b")))
      assert(e.getMessage.contains("version conflict"), e.getMessage)
    } finally resetHook()
    val expected = 300L - (0L until 300L).count(_ % 7 == 5)
    assert(spark.table("pj_mc_zo").count() == expected)
    noOrphans(dir)

    PjCompaction.optimize(spark, dir, Seq("a", "b"))
    assert(spark.table("pj_mc_zo").count() == expected)
    assert(spark.table("pj_mc_zo").filter($"a" === 5).count() == 0L)
  }

  test("clone materialize racing a DV DELETE on the clone: loud conflict, delete stands") {
    val src = java.nio.file.Files.createTempDirectory("pj_mc_src").toString
    val tgt = java.nio.file.Files.createTempDirectory("pj_mc_tgt")
    java.nio.file.Files.delete(tgt)
    spark.range(0, 120).select($"id", ($"id" % 4).as("m"))
      .coalesce(1).write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(src)
    PjClone.shallowClone(spark, src, tgt.toString)
    spark.sql("DROP TABLE IF EXISTS pj_mc_clone")
    spark.sql(s"CREATE TABLE pj_mc_clone USING pjparquet OPTIONS (path '$tgt')")

    oneShot(spark.sql("DELETE FROM pj_mc_clone WHERE m = 1"))
    try {
      val e = intercept[PJException](PjClone.materialize(spark, tgt.toString))
      assert(e.getMessage.contains("version conflict"), e.getMessage)
    } finally resetHook()
    assert(spark.table("pj_mc_clone").count() == 90L)

    // retry localizes the post-delete live rows; the table owns its bytes
    val r = PjClone.materialize(spark, tgt.toString)
    assert(r.filesMaterialized == 1L)
    assert(spark.table("pj_mc_clone").count() == 90L)
    assert(spark.table("pj_mc_clone").filter($"m" === 1).count() == 0L)
    val (fs, root) = fsOf(tgt.toString)
    assert(PjCommitLog.latest(fs, root).get.entries.forall(!_.path.startsWith("/")),
      "materialized table must own all of its entries")
  }

  test("writer racing RESTORE: the restore conflicts loudly, the write stays at HEAD") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_rst").toString
    def append(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).toDF("id").coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(dir)
    append(0, 10) // v1
    append(10, 20) // v2

    oneShot(append(20, 30)) // lands between restore's head read and its commit
    try {
      val e = intercept[PJException](PjRestore.restore(spark, dir, 1L))
      assert(e.getMessage.contains("version conflict"), e.getMessage)
    } finally resetHook()

    // the racing write is visible at HEAD — never silently dropped
    val df = spark.read.format("pjparquet").load(dir)
    assert(df.count() == 30L)
    val (fs, root) = fsOf(dir)
    assert(PjCommitLog.latest(fs, root).get.version == 3L)

    // a clean retry restores exactly v1
    val r = PjRestore.restore(spark, dir, 1L)
    assert(r.committed.isDefined)
    assert(spark.read.format("pjparquet").load(dir).count() == 10L)
  }

  test("merge-on-read DML losing to a compaction: sanctioned conflict, retry lands (fuzz pin)") {
    // PjConcurrencyFuzzSpec seed 3 found this as a non-conflict crash:
    // a DV DELETE's scan plans against version V, a compaction retires
    // the touched file before the delta commit, and the position-keyed
    // vectors no longer apply. The loss must surface as the CONFLICT
    // shape (retryable), Spark's abort must sweep the staged job files,
    // and a retry against the new state must land.
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_dmlrace").toString
    spark.range(0, 200).select($"id", ($"id" % 10).as("m"))
      .repartition(4).write.format("pjparquet")
      .mode("append").option("log.enabled", "true").save(dir)
    spark.sql("DROP TABLE IF EXISTS pj_mc_dmlrace")
    spark.sql(s"CREATE TABLE pj_mc_dmlrace USING pjparquet OPTIONS (path '$dir')")
    // the compaction lands INSIDE the DML's task-finish-to-commit window
    graft.sources.pjparquet.PjDeltaWrite.testHookBeforeCommit = { () =>
      graft.sources.pjparquet.PjDeltaWrite.testHookBeforeCommit = () => ()
      PjCompaction.compact(spark, dir)
    }
    spark.range(0, 200).filter($"id" % 10 === 3).select($"id")
      .createOrReplaceTempView("pj_mc_dmlrace_src")
    try {
      val e = intercept[Throwable](spark.sql(
        """MERGE INTO pj_mc_dmlrace t USING pj_mc_dmlrace_src s ON t.id = s.id
          |WHEN MATCHED THEN DELETE""".stripMargin))
      def conflictShaped(t: Throwable): Boolean = {
        var c: Throwable = t
        while (c != null) {
          if (Option(c.getMessage).exists(_.contains("conflict"))) return true
          c = c.getCause
        }
        false
      }
      assert(conflictShaped(e), s"DML loss must be the retryable conflict shape: $e")
    } finally {
      graft.sources.pjparquet.PjDeltaWrite.testHookBeforeCommit = () => ()
    }
    // nothing from the dead DML leaked: content is exactly the compacted base
    assert(spark.table("pj_mc_dmlrace").count() == 200L)
    assert(spark.table("pj_mc_dmlrace").filter($"m" === 3).count() == 20L)
    noOrphans(dir)
    // the retry against the compacted state lands
    spark.sql(
      """MERGE INTO pj_mc_dmlrace t USING pj_mc_dmlrace_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(spark.table("pj_mc_dmlrace").filter($"m" === 3).count() == 0L)
    assert(spark.table("pj_mc_dmlrace").count() == 180L)
  }

  test("table walks never enter a concurrent writer's scratch dirs (fuzz pin)") {
    // PjConcurrencyFuzzSpec seed 0: fs.listFiles(root, true) descended
    // into a racing op's live .compact_tmp_*/_temporary and crashed on
    // its committer's deletes; on an UNLOGGED table the scratch parquet
    // could even have been CONSUMED as a compaction candidate. The walk
    // must skip internal dirs entirely.
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("pj_mc_scratch").toString
    spark.range(0, 40).select($"id", ($"id" % 4).as("m")).repartition(4)
      .write.format("pjparquet").mode("append").save(dir) // unlogged
    // plant a real parquet inside a live-looking scratch dir
    spark.range(900, 910).select($"id", lit(0).as("m")).coalesce(1)
      .write.parquet(s"$dir/.compact_tmp_live/stage")
    new java.io.File(s"$dir/.compact_tmp_live/_temporary/0/_temporary").mkdirs()
    val (fs, root) = fsOf(dir)
    val walked = graft.sources.pjparquet.PjBatchWrite.walkDataFiles(fs, root)
    assert(walked.nonEmpty &&
      walked.forall(!_.getPath.toString.contains(".compact_tmp")),
      s"walk entered scratch: ${walked.map(_.getPath.getName)}")
    // compaction neither crashes on nor consumes the scratch rows
    PjCompaction.compact(spark, dir)
    assert(spark.read.format("pjparquet").load(dir).count() == 40L,
      "scratch rows must never enter the table")
    assert(new java.io.File(s"$dir/.compact_tmp_live/stage").exists(),
      "another op's scratch must be left alone")
  }

  private def lit(v: Long) = org.apache.spark.sql.functions.lit(v)
}
