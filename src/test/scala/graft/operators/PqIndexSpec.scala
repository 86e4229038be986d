package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Persisted PQ ANN index: build once, query without re-encoding the
  * corpus, reconcile incrementally at write commits.
  */
class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 16

  /** Deterministic synthetic corpus: id + unit-ish embedding. */
  private def corpus(n: Int, idOffset: Long = 0L): DataFrame =
    spark.range(0, n).select(
      ($"id" + idOffset).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => sin(($"id" + idOffset + 1) * (j + 1) * 0.7)).as("embedding"))

  private def srcDirs(root: String): Set[String] =
    Option(new java.io.File(s"$root/_pq_index/codes").listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("src=")).toSet

  test("indexed topK == inline pqAnnTopK, and the plan scans codes instead of encoding") {
    val root = Files.createTempDirectory("pq_idx").toString
    graft.sources.pjparquet.PjWriter.writeWithIndex(corpus(300), root)
    PqIndex.build(spark, root, "vec_id", "embedding", dim, m = 4, codes = 8)
    assert(Files.exists(Paths.get(root, "_pq_index", "_meta.parquet")))
    assert(srcDirs(root).nonEmpty, "codes table must be partitioned by source key")

    val probes = corpus(5)
    val indexed = PqIndex.topK(spark, root, probes, k = 3, refineFactor = 4)

    // plan-shape proof: the codes come from a stored relation (pq_codes in
    // a scan's output), not from encode expressions over the corpus
    val codeRelations = indexed.queryExecution.analyzed.collect {
      case r: DataSourceV2Relation if r.output.exists(_.name == "pq_codes") => r
    }
    assert(codeRelations.nonEmpty,
      s"indexed path must SCAN pq_codes:\n${indexed.queryExecution.analyzed}")

    // value-identical to the inline operator under the same codebooks
    val meta = spark.read.parquet(s"$root/_pq_index/_meta.parquet").head()
    val cb = meta.getSeq[scala.collection.Seq[scala.collection.Seq[Double]]](5)
      .map(_.map(_.toArray).toArray).toArray
    val inline = PipelineOps.pqAnnTopK(
      corpus(300), probes, k = 3, dim = dim, m = 4, codes = 8,
      refineFactor = 4, codebooks = Some(cb))
    def canon(df: DataFrame) = df.select($"probe_id", $"neighbor_id",
      round($"cos_sim", 9).as("s")).collect().map(_.toString).sorted.toSeq
    assert(canon(indexed) == canon(inline))
  }

  test("write commit reconciles the index: appends encode, deletes drop, results track") {
    val root = Files.createTempDirectory("pq_idx_commit").toString
    corpus(100).write.format("pjparquet").mode("overwrite").save(root)
    PqIndex.build(spark, root, "vec_id", "embedding", dim, m = 4, codes = 8)
    val before = srcDirs(root)

    // DSv2 append commits -> maintainIfPresent encodes ONLY the new files
    corpus(50, idOffset = 1000L).write.format("pjparquet").mode("append").save(root)
    val after = srcDirs(root)
    assert(before.subsetOf(after), "existing partitions must survive an append untouched")
    assert(after.size > before.size, "the appended files must gain code partitions")

    // the persisted index now covers the appended ids without any rebuild
    val probe = corpus(1, idOffset = 1000L) // = appended vector 1000
    val top = PqIndex.topK(spark, root, probe, k = 5).collect()
    assert(top.length == 5)

    // truncate to a smaller corpus: stale keys must drop at commit
    corpus(30).write.format("pjparquet").mode("overwrite").save(root)
    val truncated = srcDirs(root)
    assert(truncated.intersect(before).isEmpty && truncated.intersect(after).isEmpty,
      "overwrite must drop every pre-existing code partition")
    val ids = spark.read.format("pjparquet").load(s"$root/_pq_index/codes")
      .select($"vec_id").as[Long].collect().toSet
    assert(ids == (0L until 30L).toSet, s"codes must track the truncated corpus, got $ids")
  }

  test("IVF routing: nprobe prunes codes partitions at planning time, recall holds") {
    val root = Files.createTempDirectory("pq_idx_ivf").toString
    graft.sources.pjparquet.PjWriter.writeWithIndex(corpus(400), root)
    PqIndex.build(spark, root, "vec_id", "embedding", dim, m = 4, codes = 8,
      nlist = 8)
    // every codes file lives under a list= subdirectory
    val listDirs = Option(new java.io.File(s"$root/_pq_index/codes").listFiles())
      .toSeq.flatten.filter(_.isDirectory)
      .flatMap(src => Option(src.listFiles()).toSeq.flatten)
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("list=")).toSet
    assert(listDirs.size > 2, s"IVF build must fan codes across lists, got $listDirs")

    val probes = corpus(3)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val nprobe = 2
      val routed = PqIndex.topK(spark, root, probes, k = 3, refineFactor = 4,
        nprobe = nprobe)
      val rows = routed.collect()
      assert(rows.groupBy(_.getLong(0)).forall(_._2.length == 3),
        "each probe must still get k neighbors")

      // planning-time proof: the codes scan planned ONLY probed list dirs
      val codeFiles = routed.queryExecution.executedPlan
        .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
        .flatMap(_.inputRDD.partitions)
        .collect {
          case p: org.apache.spark.sql.execution.datasources.v2.DataSourceRDDPartition =>
            p.inputPartitions
        }.flatten
        .collect { case p: graft.sources.pjparquet.PjInputPartition => p.filePath }
        .filter(_.contains("_pq_index/codes"))
      assert(codeFiles.nonEmpty, "the routed plan must scan the codes table")
      val planned = codeFiles.flatMap("list=([0-9]+)".r.findFirstMatchIn(_))
        .map(_.group(1).toLong).toSet
      assert(planned.size <= nprobe * 3,
        s"planned lists $planned must be bounded by nprobe x probes")
      assert(planned.size < listDirs.size,
        s"routing must prune some of ${listDirs.size} lists, planned $planned")

      // recall vs the flat (all-lists) index path under identical codebooks
      val flat = PqIndex.topK(spark, root, probes, k = 3, refineFactor = 4)
      def pairsOf(df: DataFrame) =
        df.select($"probe_id", $"neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val overlap = pairsOf(routed).intersect(pairsOf(flat)).size
      assert(overlap * 100 >= flat.count() * 50,
        s"IVF recall vs flat index too low: $overlap of ${flat.count()}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("bulk probes route executor-side: no probe vector ever collects to the driver") {
    val root = Files.createTempDirectory("pq_idx_bulk").toString
    graft.sources.pjparquet.PjWriter.writeWithIndex(corpus(1000), root)
    PqIndex.build(spark, root, "vec_id", "embedding", dim, m = 4, codes = 8, nlist = 8)

    // a bulk probe batch — large enough that driver-side vector routing
    // would be the bottleneck, routed entirely executor-side instead
    val probes = corpus(1000)
    val routed = PqIndex.topK(spark, root, probes, k = 3, refineFactor = 4, nprobe = 2)

    // structural proof: the old driver-side router materialized the pair
    // table from collected vectors as a LocalTableScan; the executor-side
    // path derives pairs FROM the probe relation, so no local relation of
    // collected rows appears anywhere in the plan
    val localScans = routed.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(localScans.isEmpty,
      s"bulk routing must not materialize driver-collected relations: $localScans")

    // and the routing is still correct: k neighbors per probe (self is
    // excluded by the ANN contract), and the periodic sin corpus gives
    // every probe near-duplicates at cos >= 0.99 — the top-1 must find one
    val rows = routed.select($"probe_id", $"rank", $"cos_sim").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(rows.map(_._1).distinct.length == 1000)
    assert(rows.groupBy(_._1).forall(_._2.length == 3))
    val goodTop1 = rows.count(r => r._2 == 1 && r._3 >= 0.99)
    assert(goodTop1 * 100 >= 1000 * 90,
      s"IVF bulk routing recall collapsed: $goodTop1/1000 strong top-1 hits")
  }

  test("a fresh index reconciles with zero jobs and an unindexed root is untouched") {
    val root = Files.createTempDirectory("pq_idx_noop").toString
    corpus(50).write.format("pjparquet").mode("overwrite").save(root)
    // no index built: the commit hook must leave the root alone
    corpus(10, 500L).write.format("pjparquet").mode("append").save(root)
    assert(!Files.exists(Paths.get(root, "_pq_index")))

    PqIndex.build(spark, root, "vec_id", "embedding", dim, m = 4, codes = 8)
    val dirs = srcDirs(root)
    PqIndex.maintain(spark, root) // fresh: pure listing, no change
    assert(srcDirs(root) == dirs)
  }
}
