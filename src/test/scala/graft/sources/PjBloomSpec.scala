package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.pjparquet.{PjBloom, PjBloomJob, PjWriter}

/** Bloom-sidecar file skipping ([[graft.sources.pjparquet.PjBloom]]):
  * equality lookups on a high-cardinality UNCLUSTERED column must plan
  * tasks only for files whose bloom admits the key — the case chunk
  * min/max stats cannot prune, because modulo-striped files all span the
  * full key range. Pruning must never change results, and a stale or
  * absent bloom must disable itself, never mis-prune.
  */
class PjBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 4 files striped by id % 4: every file's [min,max] covers ~the whole
    * id range, so stats-based pruning keeps all of them.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("pj_bloom").toString
    PjWriter.writeWithIndex(
      spark.range(1000).select(
        $"id",
        format_string("key-%04d", $"id").as("name"))
        .repartitionByRange(4, $"id" % 4),
      d)
    PjBloomJob.generate(spark, d, Seq("id", "name"), fpp = 0.001)
    d
  }

  private def plannedTasks(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  test("equality lookup plans only the bloom-admitting file") {
    val df = spark.read.format("pjparquet").load(dir)
    assert(plannedTasks(df.filter($"id" >= 0)) >= 4, "fixture must span >=4 files")
    // min/max can't prune (every file spans ~[0,999]); the bloom can
    val eq = df.filter($"id" === 42)
    assert(plannedTasks(eq) == 1, "bloom must prune the three residue-mismatched files")
    assert(eq.count() == 1)
    val none = df.filter($"id" === 424242)
    assert(plannedTasks(none) == 0, "an absent key plans zero tasks")
    assert(none.count() == 0)
  }

  test("string and IN-list lookups prune through blooms") {
    val df = spark.read.format("pjparquet").load(dir)
    val eq = df.filter($"name" === "key-0042")
    assert(plannedTasks(eq) == 1)
    assert(eq.count() == 1)
    // ids 10 and 11 live in different residue files
    val in = df.filter($"id".isin(10L, 11L))
    assert(plannedTasks(in) == 2)
    assert(in.count() == 2)
  }

  test("results match stock parquet for every pruned shape") {
    val pj = spark.read.format("pjparquet").load(dir)
    val stock = spark.read.parquet(dir)
    for (pred <- Seq(
        $"id" === 7L, $"id".isin(1L, 2L, 3L), $"name" === "key-0999",
        $"id" === 5L || $"name" === "key-0006", $"id" === 8L && $"name" === "key-0008")) {
      val a = pj.filter(pred).agg(count(lit(1)), coalesce(sum($"id"), lit(0L))).head()
      val b = stock.filter(pred).agg(count(lit(1)), coalesce(sum($"id"), lit(0L))).head()
      assert(a == b, s"mismatch for $pred")
    }
  }

  test("a stale bloom (fingerprint mismatch) disables itself") {
    val d = java.nio.file.Files.createTempDirectory("pj_bloom_stale").toString
    PjWriter.writeWithIndex(
      spark.range(100).select($"id").repartitionByRange(2, $"id" % 2), d)
    PjBloomJob.generate(spark, d, Seq("id"))
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(d).getFileSystem(hconf)
    // corrupt every sidecar's fingerprint: parse, flip fnv, rewrite
    val it = fs.listFiles(new Path(d), true)
    var rewritten = 0
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet.bloom")) {
        val buf = new Array[Byte](s.getLen.toInt)
        val in = fs.open(s.getPath)
        try in.readFully(0, buf) finally in.close()
        val parsed = PjBloom.deserialize(buf)
        val out = fs.create(s.getPath, true)
        try out.write(PjBloom.serialize(parsed.copy(footerFnv = parsed.footerFnv + 1L)))
        finally out.close()
        rewritten += 1
      }
    }
    assert(rewritten == 2, "fixture must have written two bloom sidecars")
    val df = spark.read.format("pjparquet").load(d)
    val eq = df.filter($"id" === 13L)
    assert(plannedTasks(eq) == 2, "stale blooms must be ignored — no pruning")
    assert(eq.count() == 1)
  }

  test("bloom.columns table option keeps blooms fresh across INSERT and DML") {
    val d = java.nio.file.Files.createTempDirectory("pj_bloom_opt").toString
    spark.sql("DROP TABLE IF EXISTS pj_bloom_t")
    spark.sql(
      s"""CREATE TABLE pj_bloom_t (id BIGINT, name STRING) USING pjparquet
         |OPTIONS (path '$d', `bloom.columns` 'id')""".stripMargin)
    spark.sql("INSERT INTO pj_bloom_t SELECT id, concat('n-', id) FROM range(0, 400)")
    spark.sql("INSERT INTO pj_bloom_t SELECT id, concat('n-', id) FROM range(400, 800)")
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(d).getFileSystem(hconf)
    def bloomCount: Int = {
      val it = fs.listFiles(new Path(d), true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet.bloom")) n += 1
      n
    }
    val afterInserts = bloomCount
    assert(afterInserts >= 2, s"each INSERT's files must get blooms, saw $afterInserts")
    val hit = spark.table("pj_bloom_t").filter($"id" === 42L)
    assert(hit.count() == 1)
    assert(plannedTasks(hit) < plannedTasks(spark.table("pj_bloom_t").filter($"id" >= 0L)),
      "the point lookup must plan fewer files than the full scan")
    // copy-on-write UPDATE rewrites files; commit must re-bloom them so the
    // lookup stays pruned AND correct on the new content
    spark.sql("UPDATE pj_bloom_t SET name = 'renamed' WHERE id = 42")
    val updated = spark.table("pj_bloom_t").filter($"id" === 42L)
    assert(updated.select("name").head().getString(0) == "renamed")
    assert(bloomCount >= 2, "rewritten files must carry fresh blooms")
    spark.sql("DROP TABLE pj_bloom_t")
  }

  test("missing sidecars negative-cache; generation resurfaces them") {
    val d = java.nio.file.Files.createTempDirectory("pj_bloom_neg").toString
    PjWriter.writeWithIndex(
      spark.range(400).select($"id").repartitionByRange(4, $"id" % 4), d)
    val before = PjBloom.negativeCount
    val df = spark.read.format("pjparquet").load(d)
    // first eq-filtered plan probes each file once and records the misses
    assert(df.filter($"id" === 5L).count() == 1)
    val afterFirst = PjBloom.negativeCount
    assert(afterFirst >= before + 4, s"4 probed misses must be cached ($before -> $afterFirst)")
    // a second plan must not re-probe (count unchanged) and stays correct
    assert(spark.read.format("pjparquet").load(d).filter($"id" === 6L).count() == 1)
    assert(PjBloom.negativeCount == afterFirst, "second plan must hit the negative cache")
    // generation clears the negatives so the new blooms surface at once
    PjBloomJob.generate(spark, d, Seq("id"))
    assert(PjBloom.negativeCount == 0)
    val eq = spark.read.format("pjparquet").load(d).filter($"id" === 7L)
    assert(plannedTasks(eq) == 1, "freshly built blooms must prune immediately")
    assert(eq.count() == 1)
  }

  test("unsigned-int columns never get blooms (probe/build value mismatch)") {
    // A parquet UINT32 column surfaces in Spark as LongType with the TRUE
    // unsigned value, but a naive build pass hashes the sign-extended
    // physical int32 — for values >= 2^31 that is a GUARANTEED bloom false
    // negative, i.e. silent row loss. Such columns must be ineligible.
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val d = java.nio.file.Files.createTempDirectory("pj_bloom_uint").toString
    val schema = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64).named("id"))
      .addField(Types.required(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.intType(32, false)).named("u"))
      .named("t")
    val file = new Path(d, "part-0.parquet")
    val w = ExampleParquetWriter.builder(
      org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        file, spark.sessionState.newHadoopConf()))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    // -1 as raw int32 bits = unsigned 4294967295
    w.write(gf.newGroup().append("id", 1L).append("u", -1))
    w.write(gf.newGroup().append("id", 2L).append("u", 5))
    w.close()
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, d)
    PjBloomJob.generate(spark, d, Seq("id", "u"))
    val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
    val sidecar = PjBloom.bloomSidecar(file)
    assert(fs.exists(sidecar), "the signed id column must still produce a sidecar")
    val buf = new Array[Byte](fs.getFileStatus(sidecar).getLen.toInt)
    val in = fs.open(sidecar)
    try in.readFully(0, buf) finally in.close()
    val parsed = PjBloom.deserialize(buf)
    assert(parsed.cols.contains("id"))
    assert(!parsed.cols.contains("u"), "unsigned column must be bloom-ineligible")
    // end-to-end: the >= 2^31 lookup keeps its row (no false pruning)
    val df = spark.read.format("pjparquet").load(d)
    val hit = df.filter($"u" === 4294967295L)
    assert(hit.count() == 1, "unsigned lookup must not be pruned away")
    assert(plannedTasks(hit) == 1)
  }

  test("freshness is fingerprint-proven: in-place rewrite under coarse mtime rebuilds") {
    val d = java.nio.file.Files.createTempDirectory("pj_bloom_fresh").toString
    PjWriter.writeWithIndex(spark.range(100).select($"id").coalesce(1), d)
    assert(PjBloomJob.generate(spark, d, Seq("id")) == 1L)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = new Path(d).getFileSystem(hconf)
    val dataFile = {
      val it = fs.listFiles(new Path(d), true)
      var p: Path = null
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet") && !s.getPath.getName.startsWith("."))
          p = s.getPath
      }
      p
    }
    // rewrite the data file IN PLACE with different content (different
    // footer), then force the timestamps into the shape a coarse-mtime
    // object store can produce: sidecar mtime >= data mtime. An
    // mtime-based freshness check would skip forever; the fingerprint
    // check must rebuild exactly this file.
    val tmp = java.nio.file.Files.createTempDirectory("pj_bloom_fresh2").toString
    spark.range(500, 600).select($"id").coalesce(1).write.mode("overwrite").parquet(tmp)
    val newPart = new Path(tmp).getFileSystem(hconf).listStatus(new Path(tmp))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val bytes = {
      val st = fs.getFileStatus(newPart)
      val b = new Array[Byte](st.getLen.toInt)
      val in = fs.open(newPart)
      try in.readFully(0, b) finally in.close()
      b
    }
    val out = fs.create(dataFile, true)
    try out.write(bytes) finally out.close()
    graft.sources.pjparquet.PjIndexJob.generateAll(spark, d, overwrite = true)
    val sidecar = PjBloom.bloomSidecar(dataFile)
    val t = System.currentTimeMillis()
    fs.setTimes(dataFile, t - 60000, -1)
    fs.setTimes(sidecar, t, -1)
    assert(PjBloomJob.generate(spark, d, Seq("id")) == 1L,
      "content change must trigger a rebuild even when the sidecar mtime looks fresh")
    // and the rebuilt bloom prunes correctly on the NEW content
    val df = spark.read.format("pjparquet").load(d)
    assert(df.filter($"id" === 550L).count() == 1)
    assert(plannedTasks(df.filter($"id" === 42L)) == 0, "old keys must now prune to zero files")
    // second pass: nothing to do — fingerprint match short-circuits
    assert(PjBloomJob.generate(spark, d, Seq("id")) == 0L)
  }

  test("bloom cache is LRU: hot entries survive the bound") {
    val hot = "lru-test://hot"
    val fb = PjBloom.FileBlooms(1L, 1L,
      Map("c" -> org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)))
    PjBloom.cachePutForTest(hot, fb)
    for (i <- 0 until 9000) {
      PjBloom.cachePutForTest(s"lru-test://cold-$i", fb)
      if (i % 100 == 0) PjBloom.cacheGetForTest(hot) // keep it hot
    }
    assert(PjBloom.cachedCount <= 8192, "cache must stay bounded")
    assert(PjBloom.cacheGetForTest(hot).isDefined,
      "a recently-touched entry must survive eviction of colds")
  }

  test("sidecar codec round-trips") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    bf.putLong(7L); bf.putBinary("abc".getBytes)
    val rt = PjBloom.deserialize(PjBloom.serialize(
      PjBloom.FileBlooms(123L, 456L, Map("c" -> bf))))
    assert(rt.fileLen == 123L && rt.footerFnv == 456L)
    assert(rt.cols("c").mightContainLong(7L))
    assert(rt.cols("c").mightContainBinary("abc".getBytes))
    assert(!rt.cols("c").mightContainLong(8L))
  }
}
