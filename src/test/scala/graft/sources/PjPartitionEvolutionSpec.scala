package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-13 partition-spec evolution (Iceberg-style, via
  * `ALTER TABLE ... SET TBLPROPERTIES('pj.partition.columns'=...)`): the
  * new spec applies to FUTURE writes; existing files keep their
  * generation, scans align partition values by name (missing key = null
  * partition), pruning works on both generations, and the guards refuse
  * every evolution that would change what existing rows read.
  */
class PjPartitionEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjpe", "graft.sources.pjparquet.PjCatalog")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"pj_pevo_$tag")
    java.nio.file.Files.delete(d)
    d.toString
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int =
    "pjparquet (\\d+) file\\(s\\)".r
      .findFirstMatchIn(df.queryExecution.executedPlan.toString)
      .map(_.group(1).toInt).getOrElse(fail("no pjparquet scan in plan"))

  test("evolve day -> (day, tenant): old generation reads; new writes carry both dirs") {
    val p = freshPath("evolve")
    spark.sql(s"CREATE TABLE pjpe.`$p` (id BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    (0 until 8).map(i => (i.toLong, (i % 2).toLong, s"old$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(p)
    // add the column FIRST (new, no data anywhere), then evolve
    spark.sql(s"ALTER TABLE pjpe.`$p` ADD COLUMN tenant STRING")
    spark.sql(s"ALTER TABLE pjpe.`$p` SET TBLPROPERTIES " +
      "('pj.partition.columns' = 'day:bigint,tenant:string')")
    (8 until 12).map(i => (i.toLong, (i % 2).toLong, s"new$i", s"t${i % 2}"))
      .toDF("id", "day", "v", "tenant")
      .write.format("pjparquet").mode("append").save(p)
    // the new generation's dirs carry both keys
    val newDirs = new java.io.File(p).listFiles().filter(_.isDirectory)
      .flatMap(d => d.listFiles().filter(_.isDirectory).map(t => s"${d.getName}/${t.getName}"))
      .toSet
    assert(newDirs.exists(_.matches("day=\\d/tenant=t\\d")), s"got $newDirs")
    val t = spark.table(s"pjpe.`$p`")
    assert(t.count() == 12L)
    // old-generation rows read tenant as NULL; new rows carry it
    assert(t.filter($"tenant".isNull).count() == 8L)
    assert(t.filter($"tenant" === "t1").select("id").as[Long].collect().toSet ==
      Set(9L, 11L))
    // pruning on the OLD key still prunes both generations
    assert(t.filter($"day" === 0L).count() == 6L)
    // pruning on the NEW key prunes old-generation files entirely (their
    // rows are all NULL for it) — metadata-rate
    val qNew = t.filter($"tenant" === "t0")
    assert(qNew.count() == 2L)
    assert(plannedFiles(qNew) < plannedFiles(t.filter($"id" >= 0L)),
      "a tenant predicate must prune the pre-evolution files")
  }

  test("guards: dropping or retyping a partition column refuses; shadowing data refuses") {
    val p = freshPath("guards")
    spark.sql(s"CREATE TABLE pjpe.`$p` (id BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    (0 until 4).map(i => (i.toLong, (i % 2).toLong, s"v$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(p)
    // dropping the current partition column
    val e1 = intercept[Exception](spark.sql(s"ALTER TABLE pjpe.`$p` " +
      "SET TBLPROPERTIES ('pj.partition.columns' = 'id:bigint')"))
    assert(e1.getMessage.contains("drops current partition column"))
    // retyping it
    val e2 = intercept[Exception](spark.sql(s"ALTER TABLE pjpe.`$p` " +
      "SET TBLPROPERTIES ('pj.partition.columns' = 'day:string')"))
    assert(e2.getMessage.contains("changes the type"))
    // adding a column live files store as DATA (v) — silent-NULL hazard
    val e3 = intercept[Exception](spark.sql(s"ALTER TABLE pjpe.`$p` " +
      "SET TBLPROPERTIES ('pj.partition.columns' = 'day:bigint,v:string')"))
    assert(e3.getMessage.contains("stores as") && e3.getMessage.contains("DATA"))
    // unsetting the partitioning on a partitioned table
    val e4 = intercept[Exception](spark.sql(s"ALTER TABLE pjpe.`$p` " +
      "UNSET TBLPROPERTIES ('pj.partition.columns')"))
    assert(e4.getMessage.contains("rewriting the table"))
  }

  test("maintenance over an all-null evolved key: compaction and ZORDER survive VOID inference") {
    // r17 fuzzer regression (seed 10002): appends that omit a freshly
    // evolved partition column land in <pe>=__HIVE_DEFAULT_PARTITION__
    // dirs; the stock parquet reader infers that column as VOID, and the
    // rewrite's partitionBy refused. The rewrite now aligns declared
    // partition columns back to their DECLARED types.
    val p = freshPath("voidkey")
    spark.sql(s"CREATE TABLE pjpe.`$p` (id BIGINT, k BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    import spark.implicits._
    (0 until 6).map(i => (i.toLong, i * 3L, (i % 2).toLong, s"a$i"))
      .toDF("id", "k", "day", "v")
      .coalesce(1).writeTo(s"pjpe.`$p`").append()
    spark.sql(s"ALTER TABLE pjpe.`$p` ADD COLUMN tenant BIGINT")
    spark.sql(s"ALTER TABLE pjpe.`$p` SET TBLPROPERTIES " +
      "('pj.partition.columns' = 'day:bigint,tenant:bigint')")
    // post-evolution appends OMIT tenant -> every new-gen dir is the
    // null partition; more than one file per dir so compaction has work
    for (b <- 0 until 2)
      (0 until 4).map(i => (100L + b * 10 + i, i * 3L, (i % 2).toLong, s"b$i"))
        .toDF("id", "k", "day", "v").coalesce(1).writeTo(s"pjpe.`$p`").append()
    val before = spark.table(s"pjpe.`$p`").select($"id").as[Long].collect().sorted
    spark.sql(s"CALL pjpe.system.compact(table => '$p')").collect()
    val afterCompact = spark.table(s"pjpe.`$p`").select($"id").as[Long].collect().sorted
    assert(afterCompact.toSeq == before.toSeq, "compaction must preserve rows")
    spark.sql(s"CALL pjpe.system.optimize_zorder(table => '$p', columns => 'id,k')").collect()
    val afterZorder = spark.table(s"pjpe.`$p`").select($"id").as[Long].collect().sorted
    assert(afterZorder.toSeq == before.toSeq, "zorder must preserve rows")
    // the evolved key still reads null on every generation
    assert(spark.table(s"pjpe.`$p`").filter($"tenant".isNotNull).count() == 0L)
  }

  test("RESTORE to a pre-evolution version reverts spec AND files consistently") {
    val p = freshPath("restore")
    spark.sql(s"CREATE TABLE pjpe.`$p` (id BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    (0 until 4).map(i => (i.toLong, (i % 2).toLong, s"old$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(p) // v2 (v1 = create)
    spark.sql(s"ALTER TABLE pjpe.`$p` ADD COLUMN tenant STRING") // v3
    spark.sql(s"ALTER TABLE pjpe.`$p` SET TBLPROPERTIES " +
      "('pj.partition.columns' = 'day:bigint,tenant:string')") // v4
    (4 until 8).map(i => (i.toLong, (i % 2).toLong, s"new$i", "tz"))
      .toDF("id", "day", "v", "tenant")
      .write.format("pjparquet").mode("append").save(p) // v5
    assert(spark.table(s"pjpe.`$p`").count() == 8L)
    // restore to v2: pre-evolution files AND pre-evolution spec together
    graft.sources.pjparquet.PjRestore.restore(spark, p, 2L)
    graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
    graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
    val t = spark.table(s"pjpe.`$p`")
    assert(t.count() == 4L, "restore must serve only the pre-evolution rows")
    assert(!t.columns.contains("tenant"), s"schema must revert too: ${t.columns.toSeq}")
    // appends after the restore land under the REVERTED single-key spec
    (100 until 102).map(i => (i.toLong, (i % 2).toLong, s"r$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(p)
    assert(spark.table(s"pjpe.`$p`").count() == 6L)
    assert(spark.table(s"pjpe.`$p`").filter($"day" === 0L).count() == 3L)
  }

  test("SHALLOW CLONE of a mid-evolution table carries the spec and reads both generations") {
    val src = freshPath("clonesrc")
    val tgtP = java.nio.file.Files.createTempDirectory("pj_pevo_clonetgt")
    java.nio.file.Files.delete(tgtP)
    val tgt = tgtP.toString
    spark.sql(s"CREATE TABLE pjpe.`$src` (id BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    (0 until 4).map(i => (i.toLong, (i % 2).toLong, s"old$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(src)
    spark.sql(s"ALTER TABLE pjpe.`$src` ADD COLUMN tenant STRING")
    spark.sql(s"ALTER TABLE pjpe.`$src` SET TBLPROPERTIES " +
      "('pj.partition.columns' = 'day:bigint,tenant:string')")
    (4 until 6).map(i => (i.toLong, (i % 2).toLong, s"new$i", "tc"))
      .toDF("id", "day", "v", "tenant")
      .write.format("pjparquet").mode("append").save(src)
    graft.sources.pjparquet.PjClone.shallowClone(spark, src, tgt)
    val t = spark.table(s"pjpe.`$tgt`")
    assert(t.count() == 6L)
    assert(t.filter($"tenant".isNull).count() == 4L)
    // the clone's spec is the evolved one: appends carry both keys
    (10 until 12).map(i => (i.toLong, (i % 2).toLong, s"c$i", "tc2"))
      .toDF("id", "day", "v", "tenant")
      .write.format("pjparquet").mode("append").save(tgt)
    assert(spark.table(s"pjpe.`$tgt`").filter($"tenant" === "tc2").count() == 2L)
  }

  test("DML across an in-flight evolution: DELETE exact on both generations; compaction unifies") {
    val p = freshPath("dml")
    spark.sql(s"CREATE TABLE pjpe.`$p` (id BIGINT, day BIGINT, v STRING) " +
      "USING pjparquet PARTITIONED BY (day)")
    (0 until 6).map(i => (i.toLong, (i % 2).toLong, s"old$i")).toDF("id", "day", "v")
      .write.format("pjparquet").mode("append").save(p)
    spark.sql(s"ALTER TABLE pjpe.`$p` ADD COLUMN tenant STRING")
    spark.sql(s"ALTER TABLE pjpe.`$p` SET TBLPROPERTIES " +
      "('pj.partition.columns' = 'day:bigint,tenant:string')")
    (6 until 10).map(i => (i.toLong, (i % 2).toLong, s"new$i", "tx"))
      .toDF("id", "day", "v", "tenant")
      .write.format("pjparquet").mode("append").save(p)
    // row-level delete spans both generations
    spark.sql(s"DELETE FROM pjpe.`$p` WHERE id IN (1, 7)")
    val t = spark.table(s"pjpe.`$p`")
    assert(t.count() == 8L)
    assert(t.select("id").as[Long].collect().toSet == (0L until 10L).toSet -- Set(1L, 7L))
    // compaction rewrites everything into the CURRENT spec — the layout
    // becomes uniform again (old rows land in the tenant-null partition)
    graft.sources.pjparquet.PjCompaction.compact(spark, p, targetBytes = 512L * 1024 * 1024)
    val afterCompact = spark.table(s"pjpe.`$p`")
    assert(afterCompact.count() == 8L)
    assert(afterCompact.filter($"tenant".isNull).count() == 5L)
    assert(afterCompact.filter($"tenant" === "tx").count() == 3L)
  }
}
