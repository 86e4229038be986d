package graft.sources

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjCommitLog, PjTableProperties}

/** Persisted table properties ([[graft.sources.pjparquet.PjTableProperties]]):
  * SET/UNSET TBLPROPERTIES as metadata-only commits, reserved-namespace
  * validation at DDL time, option-over-property precedence at use sites,
  * checkpoint replay survival, and the behavioral contracts the engine
  * keys off them (change feed, deletion vectors, checkpoint cadence,
  * retention defaults).
  */
class PjTablePropertiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"pj_props_$tag").toString

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  spark.conf.set("spark.sql.catalog.pjp", "graft.sources.pjparquet.PjCatalog")

  private def mkLogged(dir: String): Unit =
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").option("log.enabled", "true").save(dir)

  test("SET TBLPROPERTIES is a metadata-only commit; SHOW TBLPROPERTIES reads it back") {
    val dir = tempDir("set")
    mkLogged(dir)
    val v1 = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES(" +
      "'pj.changeFeed.enabled'='true', 'team'='data-eng')")
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.version == v1.version + 1 && head.action == "alter-properties")
    assert(head.entries.map(_.path) == v1.entries.map(_.path), "no file churn")
    val props = PjTableProperties.parse(head.propertiesJson)
    assert(props("pj.changeFeed.enabled") == "true" && props("team") == "data-eng")
    val shown = spark.sql(s"SHOW TBLPROPERTIES pjp.`$dir`")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("pj.changeFeed.enabled").contains("true"))
    assert(shown.get("team").contains("data-eng"))
  }

  test("UNSET removes; unset of an absent key is a no-op commit-wise safe") {
    val dir = tempDir("unset")
    mkLogged(dir)
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('team'='x', 'steward'='y')")
    spark.sql(s"ALTER TABLE pjp.`$dir` UNSET TBLPROPERTIES('team')")
    val props = PjTableProperties.parse(
      PjCommitLog.latest(fsOf(dir), new Path(dir)).get.propertiesJson)
    assert(!props.contains("team") && props.get("steward").contains("y"))
  }

  test("reserved-namespace typos and bad values fail the DDL loudly") {
    val dir = tempDir("validate")
    mkLogged(dir)
    val typo = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.changeFeed.enabld'='true')")
    }
    assert(typo.getMessage.contains("unknown table property"))
    val bad = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.checkpoint.interval'='zero')")
    }
    assert(bad.getMessage.contains("invalid value"))
    // nothing landed
    assert(PjCommitLog.latest(fsOf(dir), new Path(dir)).get.propertiesJson.isEmpty)
  }

  test("pj.changeFeed.enabled persists DML change rows without any cdc.enabled option") {
    val dir = tempDir("cdf")
    mkLogged(dir)
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.changeFeed.enabled'='true')")
    spark.sql(s"DELETE FROM pjp.`$dir` WHERE id = 1")
    val fs = fsOf(dir)
    assert(fs.exists(new Path(dir, "_pj_cdc")),
      "table-level change feed must persist change rows with no per-write option")
    // explicit option still wins: cdc.enabled=false on this table would
    // suppress persistence for that one operation — verified on a twin
    val dir2 = tempDir("cdf_optout")
    mkLogged(dir2)
    spark.sql(s"ALTER TABLE pjp.`$dir2` SET TBLPROPERTIES('pj.changeFeed.enabled'='true')")
    // DataFrame DV-delete path takes table options from the read resolver —
    // drive it through the source option to prove option-over-property
    val t2 = spark.read.format("pjparquet")
      .option("cdc.enabled", "false").load(dir2)
    t2.createOrReplaceTempView("pj_props_optout")
    // deleteWhere via SQL on the option-carrying relation isn't reachable
    // from a temp view; assert precedence at the resolver level instead
    val lay = graft.sources.pjparquet.PjParquetTable.resolveFiles(
      dir2, spark.sessionState.newHadoopConf(), autogen = true)
    assert(PjTableProperties.effectiveBool(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("cdc.enabled", "false")),
      lay.propertiesJson, "cdc.enabled", PjTableProperties.ChangeFeedEnabled,
      default = false) === false)
    assert(PjTableProperties.effectiveBool(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(),
      lay.propertiesJson, "cdc.enabled", PjTableProperties.ChangeFeedEnabled,
      default = false) === true)
  }

  test("pj.dataSkipping.numIndexedCols caps the recorded stats envelope; results stay exact") {
    val dir = tempDir("skipcap")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir))
    spark.sql(s"CREATE TABLE pjp.`$dir` (a BIGINT, b BIGINT, c STRING) USING pjparquet " +
      "TBLPROPERTIES ('pj.dataSkipping.numIndexedCols'='1')")
    spark.range(0, 100)
      .select($"id".as("a"), ($"id" * 2).as("b"), $"id".cast("string").as("c"))
      .coalesce(2).writeTo(s"pjp.`$dir`").append()
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.entries.nonEmpty)
    head.entries.foreach { e =>
      assert(e.stats.keySet == Set("a"),
        s"only the first physical column keeps a stats envelope: ${e.stats.keySet}")
    }
    // queries on UNindexed columns stay exact (no stats = no pruning, never
    // a wrong answer); indexed-column pruning still works
    val t = spark.table(s"pjp.`$dir`")
    assert(t.filter($"b" === 42L).count() == 1L)
    assert(t.filter($"a" < 10).count() == 10L)
    assert(t.count() == 100L)
  }

  test("numIndexedCols counts DATA columns only — a leading partition column does not eat the cap") {
    val dir = tempDir("skipcap_part")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir))
    // partition column p leads the recorded schema; it carries no file
    // stats (its value lives in the dir name), so with cap=1 the FIRST
    // DATA column (a) must still get its envelope
    spark.sql(s"CREATE TABLE pjp.`$dir` (p BIGINT, a BIGINT, b STRING) USING pjparquet " +
      "PARTITIONED BY (p) TBLPROPERTIES ('pj.dataSkipping.numIndexedCols'='1')")
    spark.range(0, 40)
      .select(($"id" % 2).as("p"), $"id".as("a"), $"id".cast("string").as("b"))
      .coalesce(1).writeTo(s"pjp.`$dir`").append()
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.entries.nonEmpty)
    head.entries.foreach { e =>
      assert(e.stats.keySet == Set("a"),
        s"cap=1 must index the first DATA column, not be eaten by the " +
          s"partition field: ${e.stats.keySet}")
    }
    assert(spark.table(s"pjp.`$dir`").filter($"a" === 7L).count() == 1L)
  }

  test("numIndexedCols caps by TABLE schema order across schema generations; 0/-1 sentinels") {
    val dir = tempDir("skipcap_schema")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(dir))
    spark.sql(s"CREATE TABLE pjp.`$dir` (a BIGINT, b BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.dataSkipping.numIndexedCols'='2')")
    spark.range(0, 10).select($"id".as("a"), ($"id" * 2).as("b"))
      .coalesce(1).writeTo(s"pjp.`$dir`").append()
    // schema evolves: files written AFTER the rename/add must index the
    // SAME leading-2 logical columns (a, b) — not their own column order
    spark.sql(s"ALTER TABLE pjp.`$dir` ADD COLUMN c BIGINT")
    spark.range(10, 20).select($"id".as("a"), ($"id" * 2).as("b"), ($"id" * 3).as("c"))
      .coalesce(1).writeTo(s"pjp.`$dir`").append()
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    head.entries.filter(_.stats.nonEmpty).foreach { e =>
      assert(e.stats.keySet == Set("a", "b"),
        s"every generation indexes the schema's leading 2 columns: ${e.stats.keySet}")
    }
    // sentinel 0: collect none
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.dataSkipping.numIndexedCols'='0')")
    spark.range(20, 25).select($"id".as("a"), ($"id" * 2).as("b"), ($"id" * 3).as("c"))
      .coalesce(1).writeTo(s"pjp.`$dir`").append()
    val afterZero = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    val newest = afterZero.entries.maxBy(_.baseRowId)
    assert(newest.stats.isEmpty, s"0 must collect no stats: ${newest.stats.keySet}")
    // sentinel -1: all columns
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.dataSkipping.numIndexedCols'='-1')")
    spark.range(25, 30).select($"id".as("a"), ($"id" * 2).as("b"), ($"id" * 3).as("c"))
      .coalesce(1).writeTo(s"pjp.`$dir`").append()
    val afterAll = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    val newest2 = afterAll.entries.maxBy(_.baseRowId)
    assert(newest2.stats.keySet == Set("a", "b", "c"),
      s"-1 must index every column: ${newest2.stats.keySet}")
    assert(spark.table(s"pjp.`$dir`").count() == 30L)
  }

  test("property commits are per-key CAS: racing keys conflict, unrelated keys merge") {
    // r17 fuzzer regression (seed 10124): a committed partition evolution
    // was erased by the next SET TBLPROPERTIES commit's stale full
    // rendering. The commit lane now applies a (sets, removes, expected)
    // DELTA onto the claim loop's own predecessor read.
    val dir = tempDir("props_cas")
    mkLogged(dir)
    val fs = fsOf(dir)
    val root = new Path(dir)
    // baseline: k1 recorded
    PjCommitLog.commit(fs, root, "alter-properties", Nil, Set.empty,
      None, Some("alter"),
      propertyCas = Some((Map("pj.expire.keepVersions" -> "7"), Set.empty,
        Map("pj.expire.keepVersions" -> None))))
    // an unrelated-key CAS computed BEFORE that commit merges, not erases
    PjCommitLog.commit(fs, root, "alter-properties", Nil, Set.empty,
      None, Some("alter"),
      propertyCas = Some((Map("pj.vacuum.retentionHours" -> "24"), Set.empty,
        Map("pj.vacuum.retentionHours" -> None))))
    val merged = PjTableProperties.parse(
      PjCommitLog.latest(fs, root).get.propertiesJson)
    assert(merged.get("pj.expire.keepVersions").contains("7"), merged.toString)
    assert(merged.get("pj.vacuum.retentionHours").contains("24"), merged.toString)
    // a SAME-key CAS whose expected prior value moved refuses loudly
    val e = intercept[PJException] {
      PjCommitLog.commit(fs, root, "alter-properties", Nil, Set.empty,
        None, Some("alter"),
        propertyCas = Some((Map("pj.expire.keepVersions" -> "9"), Set.empty,
          Map("pj.expire.keepVersions" -> None)))) // stale: expects unset
    }
    assert(e.getMessage.contains("conflict"), e.getMessage)
    assert(PjTableProperties.parse(
      PjCommitLog.latest(fs, root).get.propertiesJson)
      .get("pj.expire.keepVersions").contains("7"))
  }

  test("pj.deletionVectors.enabled=false makes DELETE copy-on-write (no vectors)") {
    val dir = tempDir("dv_off")
    mkLogged(dir)
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.deletionVectors.enabled'='false')")
    spark.sql(s"DELETE FROM pjp.`$dir` WHERE id = 1")
    val head = PjCommitLog.latest(fsOf(dir), new Path(dir)).get
    assert(head.entries.forall(_.dv.isEmpty),
      "deletion vectors disabled by property must force copy-on-write")
    assert(spark.read.format("pjparquet").load(dir).count() == 1L)
  }

  test("pj.checkpoint.interval overrides the cadence") {
    val dir = tempDir("ckpt")
    mkLogged(dir) // v1
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.checkpoint.interval'='3')") // v2
    Seq((3L, "c")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir) // v3 -> checkpoint at 3
    val fs = fsOf(dir)
    assert(fs.exists(new Path(new Path(dir, "_pj_log"), f"${3L}%020d.checkpoint.json")),
      "interval=3 must checkpoint at version 3")
  }

  test("properties survive checkpoint replay and expiry; restore rolls them back") {
    val dir = tempDir("replay")
    mkLogged(dir) // v1
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('team'='core')") // v2
    val preRestoreV = PjCommitLog.latest(fsOf(dir), new Path(dir)).get.version
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('team'='other', 'extra'='1')") // v3
    // force a checkpoint then replay through it
    val fs = fsOf(dir)
    val head = PjCommitLog.latest(fs, new Path(dir)).get
    PjCommitLog.writeCheckpoint(fs, new Path(dir), head.version)
    PjCommitLog.clearSnapshotCache()
    val replayed = PjCommitLog.read(fs, new Path(dir), head.version)
    assert(PjTableProperties.parse(replayed.propertiesJson)
      .get("team").contains("other"))
    // restore to v2 rolls the property map back
    graft.sources.pjparquet.PjRestore.restore(spark, dir, preRestoreV)
    val restored = PjCommitLog.latest(fs, new Path(dir)).get
    val props = PjTableProperties.parse(restored.propertiesJson)
    assert(props.get("team").contains("core") && !props.contains("extra"))
  }

  test("pj.bloom.columns property keeps bloom sidecars fresh on plain appends") {
    val dir = tempDir("bloom")
    mkLogged(dir)
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.bloom.columns'='id')")
    Seq((7L, "z")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir)
    val fs = fsOf(dir)
    val blooms = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".bloom")).map(_.getPath.getName)
    assert(blooms.nonEmpty, "table-level bloom contract must build sidecars on append")
  }

  test("expire_versions falls back to the recorded pj.expire.keepVersions") {
    val dir = tempDir("expire")
    mkLogged(dir) // v1
    spark.sql(s"ALTER TABLE pjp.`$dir` SET TBLPROPERTIES('pj.expire.keepVersions'='2')") // v2
    Seq((3L, "c")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir) // v3
    Seq((4L, "d")).toDF("id", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir) // v4
    val report = spark.sql(s"CALL pjp.system.expire_versions(table => '$dir')").collect()
    assert(report.head.getLong(1) == 2L, "kept must equal the recorded keepVersions")
    // and with no property, omitting the arg refuses loudly
    val dir2 = tempDir("expire_noprop")
    mkLogged(dir2)
    val e = intercept[Exception] {
      spark.sql(s"CALL pjp.system.expire_versions(table => '$dir2')").collect()
    }
    assert(e.getMessage.contains("pj.expire.keepVersions"))
  }
}
