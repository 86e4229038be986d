package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-13 generated-column partition pruning
  * ([[graft.sources.pjparquet.PjGeneratedPruning]]): a table
  * `PARTITIONED BY (g)` with `g GENERATED ALWAYS AS (CAST(ts AS DATE))`
  * prunes directories from predicates on `ts` ALONE — equality and
  * ranges — with plan-shape proof (planned file count in the scan
  * description), and never loses rows.
  */
class PjGeneratedPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  spark.conf.set("spark.sql.catalog.pjgp", "graft.sources.pjparquet.PjCatalog")

  private def freshPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"pj_genprune_$tag")
    java.nio.file.Files.delete(d)
    d.toString
  }

  /** Planned file count scraped from the executed plan's scan description
    * (`pjparquet N file(s)`).
    */
  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    "pjparquet (\\d+) file\\(s\\)".r.findFirstMatchIn(plan)
      .map(_.group(1).toInt)
      .getOrElse(fail(s"no pjparquet scan in plan:\n$plan"))
  }

  private def mkDayTable(tag: String): (String, org.apache.spark.sql.DataFrame) = {
    val p = freshPath(tag)
    spark.sql(s"CREATE TABLE pjgp.`$p` (ts TIMESTAMP, v BIGINT, " +
      "g DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING pjparquet " +
      "PARTITIONED BY (g)")
    // 4 days x 6 rows; ts-only input, g computes on write
    val rows = for (d <- 0 until 4; i <- 0 until 6)
      yield (java.sql.Timestamp.valueOf(f"2024-03-${10 + d}%02d 0$i:30:00"), (d * 6 + i).toLong)
    rows.toDF("ts", "v").write.format("pjparquet").mode("append").save(p)
    (p, spark.table(s"pjgp.`$p`"))
  }

  test("DATE partition dirs are ISO; the generated column reads back as a real date") {
    val (p, t) = mkDayTable("iso")
    val dirs = new java.io.File(p).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.count(_.startsWith("g=")) == 4 && dirs.contains("g=2024-03-10"),
      s"expected ISO date partition dirs, got ${dirs.mkString(",")}")
    val g = t.where($"v" === 7L).select($"g").head().getDate(0)
    assert(g.toString == "2024-03-11")
    assert(t.count() == 24L)
  }

  test("equality on the BASE timestamp plans only the matching day directory") {
    val (_, t) = mkDayTable("eq")
    val q = t.where($"ts" === java.sql.Timestamp.valueOf("2024-03-11 02:30:00"))
    assert(plannedFiles(q) == 1, "ts equality must prune to the one g=2024-03-11 file")
    assert(q.count() == 1L)
  }

  test("range on the BASE timestamp plans only the covered days; rows exact") {
    val (_, t) = mkDayTable("range")
    val lo = java.sql.Timestamp.valueOf("2024-03-11 03:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-03-12 01:00:00")
    val q = t.where($"ts" >= lo && $"ts" <= hi)
    // covered days: 2024-03-11 and 2024-03-12 only
    assert(plannedFiles(q) == 2,
      "a two-day ts range must plan exactly the two covered day directories")
    // correctness against the unpruned answer
    val expect = t.collect().count { r =>
      val ts = r.getTimestamp(0); !ts.before(lo) && !ts.after(hi)
    }
    assert(q.count() == expect.toLong && expect > 0)
    // open range from below
    val q2 = t.where($"ts" > java.sql.Timestamp.valueOf("2024-03-12 23:00:00"))
    assert(plannedFiles(q2) == 2, "ts > late-on-day-12 keeps day 12 (boundary) + day 13")
    assert(q2.count() == 6L)
  }

  test("year() generated BIGINT partition column prunes ranges too") {
    val p = freshPath("year")
    spark.sql(s"CREATE TABLE pjgp.`$p` (ts TIMESTAMP, v BIGINT, " +
      "y BIGINT GENERATED ALWAYS AS (year(ts))) USING pjparquet " +
      "PARTITIONED BY (y)")
    val rows = for (yr <- 2020 to 2023; i <- 0 until 3)
      yield (java.sql.Timestamp.valueOf(s"$yr-06-15 12:00:0$i"), (yr * 10 + i).toLong)
    rows.toDF("ts", "v").write.format("pjparquet").mode("append").save(p)
    val t = spark.table(s"pjgp.`$p`")
    val q = t.where($"ts" >= java.sql.Timestamp.valueOf("2022-01-01 00:00:00"))
    assert(plannedFiles(q) == 2, "a ts lower bound must keep only y>=2022 dirs")
    assert(q.count() == 6L)
  }

  test("IN on the base timestamp derives IN on the generated day") {
    val (_, t) = mkDayTable("in")
    val q = t.where($"ts".isin(
      java.sql.Timestamp.valueOf("2024-03-10 01:30:00"),
      java.sql.Timestamp.valueOf("2024-03-13 05:30:00")))
    assert(plannedFiles(q) == 2, "a two-value ts IN must plan exactly two day dirs")
    assert(q.count() == 2L)
  }

  test("null base timestamps land in the null partition and are never wrongly pruned in") {
    val p = freshPath("nulls")
    spark.sql(s"CREATE TABLE pjgp.`$p` (ts TIMESTAMP, v BIGINT, " +
      "g DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING pjparquet " +
      "PARTITIONED BY (g)")
    Seq((Option(java.sql.Timestamp.valueOf("2024-03-10 01:00:00")), 1L),
      (Option.empty[java.sql.Timestamp], 2L))
      .toDF("ts", "v").write.format("pjparquet").mode("append").save(p)
    val t = spark.table(s"pjgp.`$p`")
    // a ts predicate can never match the null row — pruning it is correct
    val q = t.where($"ts" >= java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(q.count() == 1L)
    assert(plannedFiles(q) == 1, "the null partition must prune under a ts range")
    // and the null row is still reachable
    assert(t.where($"ts".isNull).count() == 1L)
    assert(t.count() == 2L)
  }

  test("unsupported generation shapes derive nothing (no wrong pruning, all rows)") {
    val p = freshPath("unsup")
    // hash-bucket generation: deterministic but not derivable — the scan
    // must simply not prune on ts
    spark.sql(s"CREATE TABLE pjgp.`$p` (ts TIMESTAMP, v BIGINT, " +
      "b BIGINT GENERATED ALWAYS AS (pmod(v, 3))) USING pjparquet " +
      "PARTITIONED BY (b)")
    (0 until 12).map(i =>
        (java.sql.Timestamp.valueOf(s"2024-03-10 00:00:${10 + i}"), i.toLong))
      .toDF("ts", "v").write.format("pjparquet").mode("append").save(p)
    val t = spark.table(s"pjgp.`$p`")
    val all = plannedFiles(t.where($"v" >= 0L)) // ts-independent baseline
    val q = t.where($"ts" >= java.sql.Timestamp.valueOf("2024-03-10 00:00:15"))
    assert(plannedFiles(q) == all, "underivable generation must not prune anything")
    assert(q.count() == 7L)
    // filters on the partition column itself still prune exactly
    assert(plannedFiles(t.where($"b" === 1L)) < all)
    assert(t.where($"b" === 1L).count() == 4L)
  }
}
