package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.PJException
import graft.sources.pjparquet.{PjColumnMapping, PjCommitLog, PjIndexJob, PjTableProperties}

/** Column-mapping `id` mode (`pj.columnMapping.mode=id`, round 17): field
  * ids are assigned at CREATE (1..n), stamped into every written parquet
  * file, bumped (never reused) by ADD COLUMN via the maxColumnId
  * high-water mark, and reads resolve columns BY ID — so a file written
  * by an id-keyed engine (Iceberg) whose column NAMES differ from the
  * table's physical names still serves the right bytes across renames on
  * either side.
  */
class PjColumnMappingIdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjid", "graft.sources.pjparquet.PjCatalog")

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def fsOf(dir: String) = new Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** parquet field ids physically stored in one data file's schema. */
  private def fileIds(dir: String): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(f.getAbsolutePath), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .flatMap(t => Option(t.getId).map(id => t.getName -> id.intValue())).toMap
    finally r.close()
  }

  test("CREATE assigns ids 1..n; written files carry them; RENAME keeps reads exact") {
    val t = freshDir("pj_idmode")
    spark.sql(s"CREATE TABLE pjid.`$t` (k BIGINT, name STRING, v BIGINT) " +
      "USING pjparquet TBLPROPERTIES ('pj.columnMapping.mode'='id')")
    val snap0 = PjCommitLog.latest(fsOf(t), new Path(t)).get
    val rec0 = org.apache.spark.sql.types.DataType.fromJson(snap0.dataSchemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(rec0.fields.map(PjColumnMapping.fieldId(_).get).toSeq == Seq(1L, 2L, 3L))
    assert(PjTableProperties.recorded(snap0.propertiesJson,
      PjTableProperties.ColumnMappingMaxId).contains("3"))
    spark.range(0, 10).select($"id".as("k"), concat(lit("n"), $"id").as("name"),
      ($"id" * 2).as("v")).writeTo(s"pjid.`$t`").append()
    // the physical file carries the assigned ids
    assert(fileIds(t) == Map("k" -> 1, "name" -> 2, "v" -> 3), fileIds(t).toString)
    // rename + write more: both generations read exactly, projection+filter
    spark.sql(s"ALTER TABLE pjid.`$t` RENAME COLUMN v TO amount")
    spark.range(10, 20).select($"id".as("k"), concat(lit("n"), $"id").as("name"),
      ($"id" * 2).as("amount")).writeTo(s"pjid.`$t`").append()
    val rows = spark.table(s"pjid.`$t`").select($"k", $"amount")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == (0L until 20L).map(i => i -> i * 2).toMap)
    assert(spark.table(s"pjid.`$t`").filter($"amount" > 30).count() == 4L)
  }

  test("ADD COLUMN takes maxColumnId+1; DROP never frees an id; mode is CREATE-time only") {
    val t = freshDir("pj_idmode_add")
    spark.sql(s"CREATE TABLE pjid.`$t` (a BIGINT, b BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.columnMapping.mode'='id')")
    spark.sql(s"ALTER TABLE pjid.`$t` ADD COLUMN c BIGINT")
    spark.sql(s"ALTER TABLE pjid.`$t` DROP COLUMN c")
    spark.sql(s"ALTER TABLE pjid.`$t` ADD COLUMN d BIGINT")
    val snap = PjCommitLog.latest(fsOf(t), new Path(t)).get
    val rec = org.apache.spark.sql.types.DataType.fromJson(snap.dataSchemaJson.get)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val ids = rec.fields.map(f => f.name -> PjColumnMapping.fieldId(f).get).toMap
    assert(ids == Map("a" -> 1L, "b" -> 2L, "d" -> 4L),
      s"d must take id 4 (c's id 3 is never reused): $ids")
    assert(PjTableProperties.recorded(snap.propertiesJson,
      PjTableProperties.ColumnMappingMaxId).contains("4"))
    val e = intercept[PJException] {
      spark.sql(s"ALTER TABLE pjid.`$t` SET TBLPROPERTIES('pj.columnMapping.mode'='name')")
    }
    assert(e.getMessage.contains("CREATE TABLE"), e.getMessage)
  }

  /** field ids of ONE file, by path. */
  private def fileIdsOf(path: String): Map[String, Int] = {
    import scala.jdk.CollectionConverters._
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(path), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFooter.getFileMetaData.getSchema.getFields.asScala
      .flatMap(t => Option(t.getId).map(id => t.getName -> id.intValue())).toMap
    finally r.close()
  }

  /** The LIVE data files of the head snapshot (retired generations stay
    * on disk for time travel until VACUUM — they keep their old schema).
    */
  private def liveParquetFiles(dir: String): Seq[String] =
    PjCommitLog.latest(fsOf(dir), new Path(dir)).toSeq.flatMap(_.entries)
      .map(e => s"$dir/${e.path}")

  test("UPDATE, streaming epochs, and OPTIMIZE keep id-mode files id-stamped") {
    val t = freshDir("pj_idmode_dml")
    spark.sql(s"CREATE TABLE pjid.`$t` (k BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.columnMapping.mode'='id')")
    spark.range(0, 10).select($"id".as("k"), ($"id" * 2).as("v"))
      .writeTo(s"pjid.`$t`").append()
    // merge-on-read UPDATE: the rewrite's insert files must carry the ids
    spark.sql(s"UPDATE pjid.`$t` SET v = v + 100 WHERE k < 3")
    // streaming epoch append (path-started sink on the logged table)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = in.toDF().selectExpr("value AS k", "value * 2 AS v")
      .writeStream.format("pjparquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$t-ckpt")
      .start(t)
    in.addData(50L, 51L)
    q.processAllAvailable(); q.stop()
    // compaction rewrite (stock parquet writer path) re-stamps the ids
    graft.sources.pjparquet.PjCompaction.compact(spark, t)
    PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    // EVERY live data file physically carries the assigned ids
    val files = liveParquetFiles(t)
    assert(files.nonEmpty)
    for (f <- files) {
      val ids = fileIdsOf(f)
      assert(ids.get("k").contains(1) && ids.get("v").contains(2), s"$f -> $ids")
    }
    // and the table reads exactly after all three rewrite flavors
    val got = spark.table(s"pjid.`$t`").select($"k", $"v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = ((0L until 3L).map(i => i -> (i * 2 + 100)) ++
      (3L until 10L).map(i => i -> i * 2) ++
      Seq(50L -> 100L, 51L -> 102L)).toMap
    assert(got == want, s"got $got")
  }

  test("a foreign id-keyed file (different names, same ids) reads correctly") {
    // simulate an Iceberg-side rename: the foreign engine's file stores
    // columns (ident, val) with the SAME field ids our table assigned to
    // (k, v) — our read must pair them BY ID, projection and filter intact
    val t = freshDir("pj_idmode_foreign")
    spark.sql(s"CREATE TABLE pjid.`$t` (k BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.columnMapping.mode'='id')")
    spark.range(0, 5).select($"id".as("k"), ($"id" * 2).as("v"))
      .writeTo(s"pjid.`$t`").append()
    // craft the foreign file with stock Spark: field ids via metadata
    val stage = freshDir("pj_idmode_stage")
    val foreign = spark.range(100, 105).select(
      $"id".as("ident").as("ident",
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
      ($"id" * 2).as("val").as("val",
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2L).build()))
    val prevWriteIds = spark.conf.get("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try foreign.coalesce(1).write.parquet(stage)
    finally spark.conf.set("spark.sql.parquet.fieldId.write.enabled", prevWriteIds)
    // adopt it into the table: move under the root + register in the log
    val fs = fsOf(t)
    val src = new java.io.File(stage).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
    val relName = "part-foreign-0001.parquet"
    fs.rename(new Path(src.getAbsolutePath), new Path(t, relName))
    val facts = PjIndexJob.generateForPaths(spark, Seq(s"$t/$relName"))
    PjCommitLog.commit(fs, new Path(t), "append",
      facts.map(_.toEntry(relName)), Set.empty)
    PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    // full read: 10 rows, foreign values land under OUR logical names
    val all = spark.table(s"pjid.`$t`").select($"k", $"v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all == ((0L until 5L) ++ (100L until 105L)).map(i => i -> i * 2).toMap,
      s"got $all")
    // pruned projection must splice the FOREIGN file by its own names
    val vOnly = spark.table(s"pjid.`$t`").select($"v").as[Long].collect().sorted
    assert(vOnly.toSeq == ((0L until 5L) ++ (100L until 105L)).map(_ * 2).sorted)
    // filters on the renamed-away pairing stay exact
    assert(spark.table(s"pjid.`$t`").filter($"k" >= 100L).count() == 5L)
    // compaction CONSUMES the foreign file: its columns pair by field id
    // (never silently null-filled), and the rewrite outputs carry our
    // physical names + the assigned ids
    graft.sources.pjparquet.PjCompaction.compact(spark, t)
    PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    val after = spark.table(s"pjid.`$t`").select($"k", $"v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == all, s"compaction changed the data: $after")
    for (f <- liveParquetFiles(t)) {
      val ids = fileIdsOf(f)
      assert(ids.get("k").contains(1) && ids.get("v").contains(2), s"$f -> $ids")
    }
  }
}
