package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjBucketBound, PjCommitLog}

/** Declared `bucket(n, col)` partition transforms: rows route into
  * `<col>_bucket=<id>/` Hive directories where id = pmod(hash(col), n),
  * the scan reports the bucket transform as its key-grouped partitioning,
  * and two same-bucketed tables join with ZERO exchange (storage-
  * partitioned join) — the shuffle-free join on a high-cardinality key
  * that identity partitioning cannot hold (one dir per key value).
  */
class PjBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjbk", "graft.sources.pjparquet.PjCatalog")

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag)
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("rows land in bucket directories matching pmod(hash(col), n) exactly") {
    val t = freshDir("pj_bucket_route")
    spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(0, 200).select($"id", ($"id" * 3).as("v")).writeTo(s"pjbk.`$t`").append()
    // physical layout: only id_bucket=<0..3> dirs
    val dirs = Option(new java.io.File(t).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      .map(_.getName).sorted
    assert(dirs.forall(_.matches("id_bucket=[0-3]")), s"unexpected dirs: $dirs")
    assert(dirs.size == 4, s"200 ids must hit all 4 buckets: $dirs")
    // every row's directory matches the engine's OWN hash contract — the
    // exact expression the SPJ-bound V2 function also computes
    val rows = spark.table(s"pjbk.`$t`")
      .select($"id", expr("pmod(hash(id), 4)").cast("long").as("expected"),
        col("id_bucket"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), s"row $r landed in the wrong bucket")
      assert(PjBucketBound.bucketOf(r.getLong(0),
        org.apache.spark.sql.types.LongType, 4) == r.getLong(1),
        s"V2 bucket function disagrees with the SQL expression for id=${r.getLong(0)}")
    }
  }

  test("two same-bucketed tables join with zero exchange (SPJ); values hash-exact") {
    val ta = freshDir("pj_bucket_a")
    val tb = freshDir("pj_bucket_b")
    spark.sql(s"CREATE TABLE pjbk.`$ta` (k BIGINT, a BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE pjbk.`$tb` (k BIGINT, b BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.range(0, 500).select($"id".as("k"), ($"id" * 2).as("a"))
      .writeTo(s"pjbk.`$ta`").append()
    spark.range(0, 500).filter($"id" % 2 === 0)
      .select($"id".as("k"), ($"id" * 7).as("b")).writeTo(s"pjbk.`$tb`").append()
    def joined(sess: org.apache.spark.sql.SparkSession) = {
      sess.conf.set("spark.sql.catalog.pjbk", "graft.sources.pjparquet.PjCatalog")
      sess.table(s"pjbk.`$ta`")
        .join(sess.table(s"pjbk.`$tb`"), "k")
        .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s"))
    }
    // plan-shape on an isolated session carrying the SPJ confs
    val iso = spark.newSession()
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = joined(iso).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"same-bucketed join must be exchange-free:\n$plan")
    val r = joined(iso).collect().head
    assert(r.getLong(0) == 250L)
    assert(r.getLong(1) == (0L until 500L by 2).map(k => k * 2 + k * 7).sum)
    // without SPJ confs the values are identical (just with a shuffle)
    val r2 = joined(spark).collect().head
    assert(r2.getLong(0) == r.getLong(0) && r2.getLong(1) == r.getLong(1))
  }

  test("bucketed tables are full citizens: DML, bucket stays consistent through rewrite") {
    val t = freshDir("pj_bucket_dml")
    spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, id)) " +
      "TBLPROPERTIES ('pj.deletionVectors.enabled'='false')")
    spark.range(0, 100).select($"id", $"id".as("v")).writeTo(s"pjbk.`$t`").append()
    spark.sql(s"DELETE FROM pjbk.`$t` WHERE id % 10 = 0")
    assert(spark.table(s"pjbk.`$t`").count() == 90L)
    spark.sql(s"UPDATE pjbk.`$t` SET v = v + 1000 WHERE id = 7")
    val row = spark.table(s"pjbk.`$t`").filter($"id" === 7).head()
    assert(row.getAs[Long]("v") == 1007L)
    // rewritten files still live under correct bucket dirs
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = PjCommitLog.latest(fs, root).get.files
    assert(files.nonEmpty && files.forall(_.matches("id_bucket=[0-3]/.*")),
      s"every live file must sit in a bucket dir: $files")
  }

  test("point lookups prune to the one bucket directory (derived bucket pruning)") {
    // equality/IN on the bucket SOURCE column derives the exact bucket id
    // through the generated-column pruning lane — a point lookup on a
    // bucket(n, col) table reads 1/n of the files, no stats involved
    val t = freshDir("pj_bucket_prune")
    spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(0, 400).select($"id", ($"id" * 3).as("v"))
      .writeTo(s"pjbk.`$t`").append()
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan.toString
      "pjparquet (\\d+) file\\(s\\)".r.findFirstMatchIn(plan)
        .map(_.group(1).toInt)
        .getOrElse(fail(s"no pjparquet scan in plan:\n$plan"))
    }
    val total = plannedFiles(spark.table(s"pjbk.`$t`"))
    assert(total >= 4, s"expected at least one file per bucket, planned $total")
    val q = spark.table(s"pjbk.`$t`").filter($"id" === 42L)
    assert(plannedFiles(q) <= total / 4,
      s"id equality must prune to one bucket's files (planned ${plannedFiles(q)} of $total)")
    assert(q.count() == 1L && q.head().getAs[Long]("v") == 126L)
    // IN-lists derive too (union of the listed values' buckets)
    val qin = spark.table(s"pjbk.`$t`").filter($"id".isin(7L, 42L))
    assert(plannedFiles(qin) <= total / 2, "IN must prune to the listed values' buckets")
    assert(qin.count() == 2L)
    // inequality derives nothing and stays exact
    assert(spark.table(s"pjbk.`$t`").filter($"id" > 395L).count() == 4L)
  }

  test("path-based appends (no catalog) route into bucket dirs; COPY INTO works") {
    // df.write.format("pjparquet").save(path) creates a relation with no
    // FunctionCatalog, so the write cannot request the bucket(n, col)
    // transform distribution — it must fall back (plain-column clustering,
    // per-bucket writer map) instead of failing analysis with Spark's
    // "not currently supported"
    val t = freshDir("pj_bucket_pathwrite")
    spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, id))")
    spark.range(0, 120).select($"id", ($"id" * 3).as("v"))
      .write.format("pjparquet").mode("append").save(t)
    val rows = spark.table(s"pjbk.`$t`")
      .select($"id", expr("pmod(hash(id), 4)").cast("long").as("expected"), col("id_bucket"))
      .collect()
    assert(rows.length == 120)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1), s"row $r in wrong bucket"))
    // COPY INTO ingests through the same path-based write lane
    val src = freshDir("pj_bucket_copysrc")
    spark.range(200, 260).select($"id", ($"id" * 3).as("v"))
      .write.parquet(src)
    val rep = spark.sql(s"CALL pjbk.system.copy_into('$t', '$src')").collect().head
    assert(rep.getLong(3) == 60L, rep.toString)
    assert(spark.table(s"pjbk.`$t`").count() == 180L)
    val check = spark.table(s"pjbk.`$t`")
      .filter(col("id_bucket") =!= expr("pmod(hash(id), 4)").cast("long")).count()
    assert(check == 0L, "COPY INTO rows must land in their hash buckets")
  }

  test("streaming sink: epochs route into bucket dirs; epoch replay stays exactly-once") {
    import spark.implicits._
    val t = freshDir("pj_bucket_stream")
    spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, v BIGINT) USING pjparquet " +
      "PARTITIONED BY (bucket(4, id))")
    val src = java.nio.file.Files.createTempDirectory("pj_bucket_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("pj_bucket_ckpt").toString
    spark.range(0, 60).select($"id", ($"id" * 3).as("v")).coalesce(1)
      .write.mode("append").parquet(src)
    val q = spark.readStream.schema("id BIGINT, v BIGINT").parquet(src)
      .writeStream.format("pjparquet")
      .option("path", t).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.table(s"pjbk.`$t`")
      .select($"id", expr("pmod(hash(id), 4)").cast("long").as("expected"), col("id_bucket"))
      .collect()
    assert(rows.length == 60)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1), s"row $r in wrong bucket"))
    // second batch through the same checkpoint ingests only the new file
    spark.range(100, 130).select($"id", ($"id" * 3).as("v")).coalesce(1)
      .write.mode("append").parquet(src)
    val q2 = spark.readStream.schema("id BIGINT, v BIGINT").parquet(src)
      .writeStream.format("pjparquet")
      .option("path", t).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(120000)
    assert(spark.table(s"pjbk.`$t`").count() == 90L)
    assert(spark.table(s"pjbk.`$t`")
      .filter(col("id_bucket") =!= expr("pmod(hash(id), 4)").cast("long")).count() == 0L)
  }

  test("refusals: float bucket column, multiple bucket transforms, bad specs") {
    val t = freshDir("pj_bucket_bad")
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, x DOUBLE) USING pjparquet " +
        "PARTITIONED BY (bucket(4, x))")
    }
    assert(e1.getMessage.contains("floating-point"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT, k BIGINT) USING pjparquet " +
        "PARTITIONED BY (bucket(4, id), bucket(8, k))")
    }
    assert(e2.getMessage.contains("at most one"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql(s"CREATE TABLE pjbk.`$t` (id BIGINT) USING pjparquet " +
        "PARTITIONED BY (bucket(4, nope))")
    }
    // Spark's own analyzer rejects the unknown reference before the
    // catalog even sees it
    assert(e3.getMessage.contains("nope"), e3.getMessage)
  }
}
