package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.PjWriter

/** Additive schema evolution through `mergeSchema=true`: union schema,
  * per-file splice of only the columns a file has, reader null-fill for
  * the rest — stock `spark.read.option("mergeSchema", true)` semantics on
  * the index-planned path. The default stays strict (hard error), and
  * same-name type conflicts always fail loudly.
  */
class PjSchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val evoDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("pj_evo").toString
    // generation 1: (id, s); generation 2 adds `extra`
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "s", "extra")
      .coalesce(1).write.mode("append").parquet(dir)
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    dir
  }

  private def merged = spark.read.format("pjparquet")
    .option("mergeSchema", "true").load(evoDir)

  test("default is strict and names the escape hatch") {
    val e = intercept[graft.core.PJException] {
      spark.read.format("pjparquet").load(evoDir).count()
    }
    assert(e.getMessage.contains("schema mismatch across files"))
    assert(e.getMessage.contains("mergeSchema=true"))
  }

  test("union schema, null-filled rows, matches stock mergeSchema read") {
    assert(merged.columns.toSeq == Seq("id", "s", "extra"))
    val got = merged.orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == Seq(
      (1L, "a", None), (2L, "b", None), (3L, "c", Some(30L)), (4L, "d", Some(40L))))
    val stock = spark.read.option("mergeSchema", "true").parquet(evoDir)
      .orderBy($"id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq == stock.toSeq)
  }

  test("projection of only the evolved column; filters on both generations") {
    // old files contribute pure null-fill rows (their splice keeps the
    // full footer, but the reader requests no physical column)
    assert(merged.select($"extra").collect().map(r =>
      if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq == Seq(-1L, -1L, 30L, 40L))
    // filter on a column some files lack: no global row-group predicate,
    // but results stay exact via residual evaluation
    assert(merged.filter($"extra" > 30L).select($"id").as[Long].collect().toSeq == Seq(4L))
    assert(merged.filter($"extra".isNull).count() == 2L)
    // filter on a universally-present column still row-group-filters
    assert(merged.filter($"id" <= 2L).count() == 2L)
  }

  test("aggregate pushdown composes: count(*) metadata-only, evolved-column aggs fall back") {
    val cnt = merged.agg(count(lit(1)).as("n"))
    assert(cnt.head().getLong(0) == 4L)
    assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // count(extra) would need null counts for files that lack the column
    // entirely — must fall back and still be exact
    val cntExtra = merged.agg(count($"extra").as("n"))
    assert(!cntExtra.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    assert(cntExtra.head().getLong(0) == 2L)
  }

  test("same-name type conflict fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("pj_evo_conflict").toString
    Seq((1L, "a")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    Seq(("x", "b")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    val e = intercept[graft.core.PJException] {
      spark.read.format("pjparquet").option("mergeSchema", "true").load(dir).count()
    }
    assert(e.getMessage.contains("type conflict on column 'id'"))
  }

  test("zero-row-group files are skipped by resolution and the index fleet") {
    val dir = java.nio.file.Files.createTempDirectory("pj_emptyfile").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1).write.mode("append").parquet(dir)
    // a genuinely empty file, as Spark writes for an empty partition
    spark.emptyDataset[(Long, String)].toDF("id", "s")
      .coalesce(1).write.mode("append").parquet(dir)
    val written = graft.sources.pjparquet.PjIndexJob.generateAll(spark, dir)
    assert(written == 1L) // only the non-empty file got a sidecar
    assert(spark.read.format("pjparquet").load(dir).count() == 2L)
    assert(spark.read.format("pjparquet").load(dir)
      .agg(count(lit(1))).head().getLong(0) == 2L) // pushdown path too
  }

  test("evolved directory still writes and compacts") {
    // compaction reads with basePath semantics; run it over a COPY of the
    // evolved dir to prove maintenance ops keep working under evolution
    val dir = java.nio.file.Files.createTempDirectory("pj_evo_compact").toString
    PjWriter.writeWithIndex(
      spark.read.option("mergeSchema", "true").parquet(evoDir).repartition(4), dir)
    // repartition(4) of 4 rows typically yields 2-3 data files plus one
    // zero-row-group file for an empty partition — which the index fleet
    // must skip and compaction must happily consume
    val r = graft.sources.pjparquet.PjCompaction.compact(spark, dir, targetBytes = 1024 * 1024)
    assert(r.smallFiles >= 2)
    assert(spark.read.format("pjparquet").load(dir).count() == 4L)
  }

  // ------------------------------------------------- type widening (r11)

  test("compaction across a widening: INT32 and INT64 generations rewrite together") {
    // r17 fuzzer regression (seed 13063): a compaction group holding both
    // widths of a widened column died in parquet's schema merge
    // (CANNOT_MERGE_SCHEMAS); such groups now split per-file and the
    // union's type coercion performs the widening
    val dir = java.nio.file.Files.createTempDirectory("pj_widen_compact").toString
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    for (b <- 0 until 2)
      Seq((b * 10 + 1, b.toLong)).toDF("k", "v").coalesce(1)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(dir) // INT32 generation, 2 files
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN k TYPE BIGINT")
    for (b <- 0 until 2)
      Seq((3000000000L + b, 9L + b)).toDF("k", "v").coalesce(1)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(dir) // INT64 generation, 2 files
    val before = spark.read.format("pjparquet").load(dir)
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rep = graft.sources.pjparquet.PjCompaction.compact(spark, dir)
    assert(rep.smallFiles == 4 && rep.compactedInto >= 1, rep.toString)
    val after = spark.read.format("pjparquet").load(dir)
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == before, s"rows must survive the cross-width rewrite: $after vs $before")
    // the rewrite normalized every file to the recorded wide type
    assert(spark.read.format("pjparquet").load(dir).schema("k").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("ALTER COLUMN int->long: metadata-only commit, old INT32 files upcast, longs append") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val dir = java.nio.file.Files.createTempDirectory("pj_widen").toString
    Seq((1, "a"), (2, "b")).toDF("k", "s").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1: k is INT32
    assert(spark.read.format("pjparquet").load(dir).schema("k").dataType == IntegerType)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN k TYPE BIGINT") // v2: metadata-only
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = graft.sources.pjparquet.PjCommitLog.latest(
      fs, new org.apache.hadoop.fs.Path(dir)).get
    assert(head.version == 2L && head.action == "alter-schema")
    assert(head.entries.size == 1, "widening must rewrite no file")
    // old INT32 file reads under the widened schema (vectorized upcast)
    val widened = spark.read.format("pjparquet").load(dir)
    assert(widened.schema("k").dataType == LongType)
    assert(widened.orderBy($"k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // genuinely-long values now append (analysis accepts long into long)
    Seq((3000000000L, "c")).toDF("k", "s").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v3
    val all = spark.read.format("pjparquet").load(dir).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(all.toSeq == Seq((1L, "a"), (2L, "b"), (3000000000L, "c")))
    // narrower (int) files appended AFTER widening keep the wide type
    Seq((7, "d")).toDF("k", "s").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v4: INT32 file
    val again = spark.read.format("pjparquet").load(dir)
    assert(again.schema("k").dataType == LongType)
    assert(again.agg(sum($"k")).head().getLong(0) == 1L + 2L + 3000000000L + 7L)
    // predicates over the widened column stay CORRECT across both widths
    // (old INT32 files' stats read as "unknown" under the long type —
    // conservative keep, never a wrong prune; see PjStatsFilter note)
    assert(spark.read.format("pjparquet").load(dir)
      .filter($"k" >= 3000000000L).count() == 1L)
    assert(spark.read.format("pjparquet").load(dir)
      .filter($"k" === 2L).count() == 1L)
  }

  test("float->double widening reads old FLOAT files exactly") {
    import org.apache.spark.sql.types.DoubleType
    val dir = java.nio.file.Files.createTempDirectory("pj_widen_f").toString
    Seq((1, 1.5f), (2, 2.25f)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN x TYPE DOUBLE")
    Seq((3, 3.125)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    val got = spark.read.format("pjparquet").load(dir).orderBy($"id")
      .collect().map(_.getDouble(1))
    // 1.5f and 2.25f are exact in both widths — bit-exact upcast
    assert(got.toSeq == Seq(1.5d, 2.25d, 3.125d))
    assert(spark.read.format("pjparquet").load(dir).schema("x").dataType == DoubleType)
  }

  test("DROP COLUMN: metadata-only, pre-drop files keep bytes, time travel preserves") {
    import org.apache.spark.sql.types.LongType
    val dir = java.nio.file.Files.createTempDirectory("pj_drop").toString
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` DROP COLUMN s") // v2: metadata-only
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = graft.sources.pjparquet.PjCommitLog.latest(
      fs, new org.apache.hadoop.fs.Path(dir)).get
    assert(head.version == 2L && head.entries.size == 1, "drop must rewrite no file")
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "x"))
    assert(t.orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L)))
    // appends post-drop carry the narrowed schema
    Seq((3L, 30L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v3
    assert(spark.read.format("pjparquet").load(dir).count() == 3L)
    assert(spark.read.format("pjparquet").load(dir).schema("x").dataType == LongType)
    // time travel BEFORE the drop still serves the dropped column's bytes
    val v1 = spark.read.format("pjparquet")
      .option("versionAsOf", "1").load(dir)
    assert(v1.columns.toSeq == Seq("id", "s", "x"))
    assert(v1.orderBy($"id").collect().map(_.getString(1)).toSeq == Seq("a", "b"))
    // a pre-drop writer still naming the dropped column refuses loudly
    val stale = intercept[Exception] {
      Seq((4L, "d", 40L)).toDF("id", "s", "x").coalesce(1)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(dir)
    }
    assert(stale.getMessage.contains("s") || stale.getMessage.contains("column"),
      s"got: ${stale.getMessage}")
    // cannot drop the final data column
    spark.sql(s"ALTER TABLE pjwiden.`$dir` DROP COLUMN x") // v-next: [id] remains
    val last = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` DROP COLUMN id")
    }
    assert(last.getMessage.contains("only data column"), s"got: ${last.getMessage}")
  }

  test("ADD COLUMN: metadata-only, pre-add files null-fill, appends may omit it") {
    val dir = java.nio.file.Files.createTempDirectory("pj_add").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN tag STRING") // v2: metadata-only
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val head = graft.sources.pjparquet.PjCommitLog.latest(
      fs, new org.apache.hadoop.fs.Path(dir)).get
    assert(head.version == 2L && head.entries.size == 1, "add must rewrite no file")
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "x", "tag"))
    assert(t.filter($"tag".isNull).count() == 2L)
    // post-add append WITH the column
    Seq((3L, 30L, "c")).toDF("id", "x", "tag").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v3
    // a pre-add writer may still OMIT the column — its file null-fills,
    // and the recorded schema keeps the added column
    Seq((4L, 40L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v4
    val full = spark.read.format("pjparquet").load(dir)
    assert(full.columns.toSeq == Seq("id", "x", "tag"))
    assert(full.orderBy($"id").collect().map(r =>
      (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq ==
      Seq((1L, 10L, None), (2L, 20L, None), (3L, 30L, Some("c")), (4L, 40L, None)))
    // filters over the mixed file set stay exact
    assert(full.filter($"tag" === "c").select($"id").as[Long].collect().toSeq == Seq(3L))
    assert(full.filter($"tag".isNull).count() == 3L)
    // time travel BEFORE the add: narrow schema
    val v1 = spark.read.format("pjparquet").option("versionAsOf", "1").load(dir)
    assert(v1.columns.toSeq == Seq("id", "x"))
    // position support: FIRST
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN flag LONG FIRST")
    assert(spark.read.format("pjparquet").load(dir).columns.toSeq ==
      Seq("flag", "id", "x", "tag"))
    // refusals: duplicate, NOT NULL, nested
    val dup = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN tag STRING")
    }
    assert(dup.getMessage.toLowerCase.contains("exists"), s"got: ${dup.getMessage}")
    val nn = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN req LONG NOT NULL")
    }
    assert(nn.getMessage.contains("nullable"), s"got: ${nn.getMessage}")
  }

  test("ADD COLUMN ... DEFAULT: existence default for pre-add files, omit-and-fill after") {
    val dir = java.nio.file.Files.createTempDirectory("pj_add_def").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1: pre-add files
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7") // v2
    // pre-add rows read the DEFAULT, not null (existence default)
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "x", "bonus"))
    assert(t.orderBy($"id").select($"bonus").as[Long].collect().toSeq == Seq(7L, 7L))
    // SQL INSERT without the column: Spark's resolver fills the default
    spark.sql(s"INSERT INTO pjwiden.`$dir` (id, x) VALUES (3, 30)") // v3
    // DataFrame append omitting the column: same omit-and-fill semantics
    Seq((4L, 40L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v4
    // explicit values (including an explicit NULL) win over the default
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (5, 50, 99), (6, 60, NULL)") // v5
    val full = spark.read.format("pjparquet").load(dir).orderBy($"id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(full == Seq(1L -> Some(7L), 2L -> Some(7L), 3L -> Some(7L),
      4L -> Some(7L), 5L -> Some(99L), 6L -> None), s"got $full")
    // filters over the defaulted column behave like the values were stored
    val filtered = spark.read.format("pjparquet").load(dir)
      .filter($"bonus" === 7L).select($"id").as[Long].collect().sorted.toSeq
    assert(filtered == Seq(1L, 2L, 3L, 4L), s"got $filtered")
    // time travel BEFORE the add: narrow schema, no default anywhere
    val v1 = spark.read.format("pjparquet").option("versionAsOf", "1").load(dir)
    assert(v1.columns.toSeq == Seq("id", "x"))
    // a nullable string default works too
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN tagd STRING DEFAULT 'z'")
    val tagged = spark.read.format("pjparquet").load(dir)
      .select($"tagd").distinct().as[String].collect().toSeq
    assert(tagged == Seq("z"))
    // NOT NULL stays refused even with a DEFAULT (pre-add files physically
    // lack the column; the reader's required-column check runs first)
    val nn = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN req LONG NOT NULL DEFAULT 1")
    }
    assert(nn.getMessage.contains("nullable"), s"got: ${nn.getMessage}")
  }

  test("SET DEFAULT changes future fills only; DROP DEFAULT makes omitted writes NULL") {
    val dir = java.nio.file.Files.createTempDirectory("pj_set_def").toString
    Seq((1L, 10L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // pre-add file
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN bonus SET DEFAULT 9")
    // the EXISTENCE default is frozen: pre-add rows keep reading 7
    def bonusOf(id: Long): Option[Long] = {
      val r = spark.read.format("pjparquet").load(dir)
        .filter($"id" === id).select($"bonus").collect().head
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    assert(bonusOf(1L) == Some(7L), "pre-add rows keep the frozen existence default")
    // SQL INSERT omitting the column resolves the NEW current default
    spark.sql(s"INSERT INTO pjwiden.`$dir` (id, x) VALUES (2, 20)")
    assert(bonusOf(2L) == Some(9L))
    // DataFrame append omitting the column MATERIALIZES the new default
    // (it cannot lean on the read-time existence lane, which serves 7)
    Seq((3L, 30L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    assert(bonusOf(3L) == Some(9L), "omitting append must materialize the current default")
    // DROP DEFAULT: omitted writes now store NULL; old promises keep
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN bonus DROP DEFAULT")
    Seq((4L, 40L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    assert(bonusOf(4L).isEmpty, "post-DROP omitting append must store NULL")
    assert(bonusOf(1L) == Some(7L) && bonusOf(3L) == Some(9L),
      "earlier rows keep their values across default changes")
    // a generated column refuses a DEFAULT
    val dir2 = java.nio.file.Files.createTempDirectory("pj_set_def_g")
    java.nio.file.Files.delete(dir2)
    spark.sql(s"CREATE TABLE pjwiden.`$dir2` (x BIGINT, " +
      "d BIGINT GENERATED ALWAYS AS (x * 2)) USING pjparquet")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir2` ALTER COLUMN d SET DEFAULT 5")
    }
    assert(e.getMessage.contains("generated"), s"got: ${e.getMessage}")
  }

  test("column comments survive checkpoints, RESTORE, and RENAME COLUMN") {
    val dir = java.nio.file.Files.createTempDirectory("pj_comment_dur")
    java.nio.file.Files.delete(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjwiden.`$dir` (id BIGINT, v BIGINT) USING pjparquet")
    spark.range(3).select($"id", ($"id" * 2).as("v"))
      .write.format("pjparquet").mode("append").save(dir.toString) // v2
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN v COMMENT 'the value'") // v3
    def comments(): Map[String, String] =
      spark.sql(s"DESCRIBE TABLE pjwiden.`$dir`").collect()
        .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(comments()("v") == "the value")
    // checkpoint + cold resolve: the comment rides the recorded schema
    spark.sql(s"CALL pjwiden.system.checkpoint('$dir')")
    graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    assert(comments()("v") == "the value", "comment lost through the checkpoint")
    // rename: the comment follows the renamed column
    spark.sql(s"ALTER TABLE pjwiden.`$dir` RENAME COLUMN v TO amount") // v4
    assert(comments()("amount") == "the value", "comment lost through RENAME")
    // RESTORE to the commented-but-unrenamed version: old name, comment kept
    spark.sql(s"CALL pjwiden.system.restore('$dir', 3)")
    graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    assert(comments()("v") == "the value", "comment lost through RESTORE")
    // RESTORE to before the comment existed: exact pre-comment schema
    spark.sql(s"CALL pjwiden.system.restore('$dir', 2)")
    graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    assert(comments()("v") == null || comments()("v").isEmpty,
      s"pre-comment restore must drop the comment: ${comments()}")
  }

  test("ALTER COLUMN COMMENT and DROP NOT NULL are metadata-only; SET NOT NULL validates") {
    val dir = java.nio.file.Files.createTempDirectory("pj_alter_meta")
    java.nio.file.Files.delete(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjwiden.`$dir` (id BIGINT NOT NULL, v BIGINT) USING pjparquet")
    Seq((1L, Some(10L)), (2L, None: Option[Long])).toDF("id", "v").coalesce(1)
      .write.format("pjparquet").mode("append").save(dir.toString)
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN v COMMENT 'the value'")
    val described = spark.sql(s"DESCRIBE TABLE pjwiden.`$dir`").collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(described("v") == "the value", s"got $described")
    // relaxing the contract is safe and metadata-only
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN id DROP NOT NULL")
    assert(spark.table(s"pjwiden.`$dir`").schema("id").nullable)
    // Spark's OWN analyzer refuses the SQL form outright (before any
    // catalog sees it) — the validating tighten ships as a CALL instead
    val eSql = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN v SET NOT NULL")
    }
    assert(eSql.getMessage.contains("non-nullable"), s"got: ${eSql.getMessage}")
    // tightening VALIDATES (round 14): live NULLs refuse loudly...
    val e = intercept[Exception] {
      spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'v')")
    }
    assert(e.getMessage.contains("hold NULLs"), s"got: ${e.getMessage}")
    assert(spark.table(s"pjwiden.`$dir`").schema("v").nullable,
      "a refused set_not_null must not change the schema")
    // ...and once the NULLs are deleted the same call proves and commits
    spark.sql(s"DELETE FROM pjwiden.`$dir` WHERE v IS NULL")
    val r = spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'v')").collect().head
    assert(r.getString(0) == "v" && r.getBoolean(1))
    assert(!spark.table(s"pjwiden.`$dir`").schema("v").nullable)
    // idempotent re-call reports no change
    assert(!spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'v')")
      .collect().head.getBoolean(1))
    // the tightened contract binds future writes: a NULL insert fails
    intercept[Exception] {
      spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (3, NULL)")
    }
    assert(spark.table(s"pjwiden.`$dir`").count() == 1L)
  }

  test("SET NOT NULL reads through existence defaults and deletion vectors") {
    val dir = java.nio.file.Files.createTempDirectory("pj_snn_lane")
    java.nio.file.Files.delete(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjwiden.`$dir` (id BIGINT, x BIGINT) USING pjparquet")
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (1, 10)")
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (2, 20)")
    // an added column WITH a default: pre-add files READ the existence
    // default (never null), but they physically LACK the column — and the
    // reader's required-column check refuses missing non-nullable columns.
    // The tighten must refuse until compaction materializes the column...
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN bonus BIGINT DEFAULT 7")
    val ePre = intercept[Exception] {
      spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'bonus')")
    }
    assert(ePre.getMessage.contains("physically lack"), s"got: ${ePre.getMessage}")
    // ...after which the same call proves (defaults materialized as 7)
    spark.sql(s"CALL pjwiden.system.compact('$dir')")
    spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'bonus')")
    assert(!spark.table(s"pjwiden.`$dir`").schema("bonus").nullable)
    assert(spark.table(s"pjwiden.`$dir`").selectExpr("sum(bonus)")
      .collect().head.getLong(0) == 14L)
    // an added column WITHOUT a default: pre-add files refuse on the
    // carrier guard; once compaction materializes it (as stored NULLs)
    // the probe itself refuses — the two guard layers in sequence
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN nb BIGINT")
    val eCarrier = intercept[Exception] {
      spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'nb')")
    }
    assert(eCarrier.getMessage.contains("physically lack"),
      s"got: ${eCarrier.getMessage}")
    // a post-add append stores nb (as NULL) -> 2 live files -> compaction
    // materializes nb everywhere; now the PROBE is what refuses
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (3, 30, 8, NULL)")
    spark.sql(s"CALL pjwiden.system.compact('$dir')")
    val e = intercept[Exception] {
      spark.sql(s"CALL pjwiden.system.set_not_null('$dir', 'nb')")
    }
    assert(e.getMessage.contains("hold NULLs"), s"got: ${e.getMessage}")
    // deletion vectors: a merge-on-read DELETE masks the null rows
    // without rewriting files — the probe must honor the mask
    val dir2 = java.nio.file.Files.createTempDirectory("pj_snn_dv")
    java.nio.file.Files.delete(dir2)
    spark.sql(s"CREATE TABLE pjwiden.`$dir2` (id BIGINT, v BIGINT) USING pjparquet " +
      "TBLPROPERTIES ('pj.deletionVectors.enabled'='true')")
    spark.sql(s"INSERT INTO pjwiden.`$dir2` VALUES (1, 10), (2, NULL), (3, 30)")
    spark.sql(s"DELETE FROM pjwiden.`$dir2` WHERE v IS NULL")
    spark.sql(s"CALL pjwiden.system.set_not_null('$dir2', 'v')")
    assert(!spark.table(s"pjwiden.`$dir2`").schema("v").nullable)
    assert(spark.table(s"pjwiden.`$dir2`").count() == 2L)
  }

  test("MERGE WITH SCHEMA EVOLUTION auto-adds source-only columns; plain MERGE refuses") {
    val dir = java.nio.file.Files.createTempDirectory("pj_mse").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir) // v1
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    Seq((2L, 25L, "b"), (3L, 30L, "c")).toDF("id", "x", "tag")
      .createOrReplaceTempView("pj_mse_src")
    // WITHOUT the clause, the source-only column must refuse at analysis
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        s"""MERGE INTO pjwiden.`$dir` AS t USING pj_mse_src AS s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET t.x = s.x, t.tag = s.tag
           |WHEN NOT MATCHED THEN INSERT (id, x, tag) VALUES (s.id, s.x, s.tag)
           |""".stripMargin)
    }
    assert(e.getMessage.toLowerCase.contains("tag"))
    // WITH SCHEMA EVOLUTION the target gains `tag` in the SAME statement:
    // Spark's ResolveMergeIntoSchemaEvolution calls our alterTable
    // (metadata-only commit), then the merge-on-read delta lands on top
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO pjwiden.`$dir` AS t
         |USING pj_mse_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "x", "tag"))
    val got = t.orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, 10L, None), (2L, 25L, Some("b")), (3L, 30L, Some("c"))))
    // the evolution rode its own metadata commit + the DML commit
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val hist = graft.sources.pjparquet.PjCommitLog.history(
      fs, new org.apache.hadoop.fs.Path(dir))
    assert(hist.exists(_.action == "alter-schema"), "schema evolution commit recorded")
  }

  test("re-ADDing a DROPped column name refuses while live files carry its bytes") {
    val dir = java.nio.file.Files.createTempDirectory("pj_readd").toString
    Seq((1L, "a", 10L)).toDF("id", "s", "x").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` DROP COLUMN s")
    // the v1 file still physically carries `s` — re-adding would read its
    // stale bytes instead of null, so the catalog refuses
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN s STRING")
    }
    assert(e.getMessage.contains("resurrect") || e.getMessage.contains("carry"),
      s"got: ${e.getMessage}")
    // after a compaction rewrite (files no longer carry `s`) the add lands
    graft.sources.pjparquet.PjCompaction.compact(spark, dir, minFilesPerDir = 1)
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ADD COLUMN s STRING")
    val t = spark.read.format("pjparquet").load(dir)
    assert(t.columns.toSeq == Seq("id", "x", "s"))
    assert(t.filter($"s".isNull).count() == 1L, "re-added column must read null, not old bytes")
  }

  test("lossy changes refuse loudly at every layer") {
    val dir = java.nio.file.Files.createTempDirectory("pj_widen_refuse").toString
    Seq((1L, "a")).toDF("k", "s").coalesce(1)
      .write.format("pjparquet").mode("append")
      .option("log.enabled", "true").save(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    // long -> int narrows: Spark's own analysis rejects it before the
    // catalog ever sees it
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN k TYPE INT")
    }
    // the catalog's own guard backstops callers that bypass SQL analysis
    val cat = new graft.sources.pjparquet.PjCatalog
    cat.initialize("pjw", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    val narrow = intercept[graft.core.PJException] {
      cat.alterTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, dir),
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("k"), org.apache.spark.sql.types.IntegerType))
    }
    assert(narrow.getMessage.contains("not supported"))
    // the commit-time recorded-schema guard refuses an incompatible append
    import org.apache.spark.sql.types._
    val prevJson = StructType(Seq(StructField("k", LongType))).json
    val nextJson = StructType(Seq(StructField("k", StringType))).json
    val e = intercept[graft.core.PJException] {
      graft.sources.pjparquet.PjBatchWrite.widenRecordedSchema(prevJson, nextJson)
    }
    assert(e.getMessage.contains("only int->long and float->double"))
    // and an unlogged table cannot widen at all
    val flat = java.nio.file.Files.createTempDirectory("pj_widen_unlogged").toString
    Seq((1, "a")).toDF("k", "s").coalesce(1)
      .write.format("pjparquet").mode("append").save(flat)
    val unlogged = intercept[graft.core.PJException] {
      cat.alterTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, flat),
        org.apache.spark.sql.connector.catalog.TableChange.updateColumnType(
          Array("k"), org.apache.spark.sql.types.LongType))
    }
    assert(unlogged.getMessage.contains("commit-log"))
  }

  test("ALTER COLUMN FIRST/AFTER reorders metadata only; reads and inserts follow") {
    val dir = java.nio.file.Files.createTempDirectory("pj_reorder")
    java.nio.file.Files.delete(dir)
    spark.conf.set("spark.sql.catalog.pjwiden", "graft.sources.pjparquet.PjCatalog")
    spark.sql(s"CREATE TABLE pjwiden.`$dir` (a BIGINT, b STRING, c BIGINT) USING pjparquet")
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (1, 'x', 100)")
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN c FIRST")
    assert(spark.table(s"pjwiden.`$dir`").columns.toSeq == Seq("c", "a", "b"))
    // pre-reorder files serve by name, unchanged
    val r1 = spark.table(s"pjwiden.`$dir`").collect().head
    assert(r1.getLong(0) == 100L && r1.getLong(1) == 1L && r1.getString(2) == "x")
    // positional INSERT binds the NEW order
    spark.sql(s"INSERT INTO pjwiden.`$dir` VALUES (200, 2, 'y')")
    val byA = spark.table(s"pjwiden.`$dir`").collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getString(2))).toMap
    assert(byA == Map(1L -> (100L, "x"), 2L -> (200L, "y")))
    // AFTER moves within the remainder; self/missing targets refuse
    spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN c AFTER b")
    assert(spark.table(s"pjwiden.`$dir`").columns.toSeq == Seq("a", "b", "c"))
    val eMissing = intercept[Exception] {
      spark.sql(s"ALTER TABLE pjwiden.`$dir` ALTER COLUMN a AFTER nope")
    }
    assert(eMissing.getMessage.contains("nope"), s"got: ${eMissing.getMessage}")
    // compaction under the reordered schema keeps values keyed by name
    spark.sql(s"CALL pjwiden.system.compact('$dir')")
    val byA2 = spark.table(s"pjwiden.`$dir`").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byA2 == Map(1L -> ("x", 100L), 2L -> ("y", 200L)))
  }
}
