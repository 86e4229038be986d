package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries that exercise the `pjparquet` DSv2 source — the
  * product surface (SURVEY.md §2.1) — against the DuckDB oracle. The oracle
  * reads the same parquet file via stock SQL, so a hash match proves the
  * index-planned scan is byte-for-byte equivalent to a footer-planned one.
  */
object MetadataQueries {

  private def pj(s: SparkSession, dir: String, table: String): DataFrame =
    s.read.format("pjparquet").load(s"$dir/$table.parquet")

  /** Once-per-JVM fixture layouts, keyed by (fixture, source dir). q80's
    * z-ordered table and q60's bucketed tables exist to measure the SCAN /
    * JOIN side of a prepared layout — rebuilding the layout on every bench
    * run (min-of-3 = three identical writes) timed the writer, which
    * q55/q62/q64/q89 already measure. Contents are deterministic for a
    * given source dir, so Verify sees identical results either way.
    */
  private val fixtures = new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** q122: planned row groups of the pre-OPTIMIZE layout, captured during
    * the fixture build (optimize rewrites the directory in place).
    */
  private val q122BeforeRgs = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  /** q166: lifecycle facts captured during the hilbert fixture build. */
  private val q166Facts = new java.util.concurrent.ConcurrentHashMap[String, (Boolean, Boolean, Boolean)]()
  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Once-per-JVM sibling session carrying the parser extension
    * ([[org.apache.spark.sql.execution.datasources.parquet.PjSparkExtensions]])
    * so driver queries can exercise the SQL STATEMENT face (COPY INTO,
    * RESTORE, OPTIMIZE, VACUUM, DESCRIBE HISTORY) — the Verify/Bench base
    * session is extension-free on purpose (it must prove stock-Spark
    * behavior for everything else). Shares the SparkContext; the active
    * and default session registrations are restored after creation.
    */
  @volatile private var sqlExt: SparkSession = null
  private def sqlStatementSession(base: SparkSession): SparkSession = synchronized {
    if (sqlExt == null) {
      val oldDefault = SparkSession.getDefaultSession
      val oldActive = SparkSession.getActiveSession
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      sqlExt = SparkSession.builder()
        .config("spark.sql.shuffle.partitions",
          base.conf.get("spark.sql.shuffle.partitions"))
        .config("spark.sql.session.timeZone",
          base.conf.get("spark.sql.session.timeZone"))
        .withExtensions(
          new org.apache.spark.sql.execution.datasources.parquet.PjSparkExtensions())
        .getOrCreate()
      oldDefault.foreach(SparkSession.setDefaultSession)
      oldActive.foreach(SparkSession.setActiveSession)
    }
    sqlExt
  }

  private def fixtureDir(key: String, dir: String)(build: String => Unit): String =
    fixtures.computeIfAbsent(s"$key:$dir", { _ =>
      val d = java.nio.file.Files.createTempDirectory(key).toString
      build(d)
      d
    })

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_pjparquet_agg" -> ((s, dir) => {
      import s.implicits._
      pj(s, dir, "lineitem")
        .filter($"l_discount" > 0.05)
        .groupBy($"l_returnflag")
        .agg(
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy($"l_returnflag")
    }),
    "q24_pjparquet_projection" -> ((s, dir) => {
      import s.implicits._
      // column pruning must reach the metadata splice: only 3 of 16 columns
      pj(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .filter($"o_totalprice" > 100000.0)
        .orderBy($"o_orderkey")
    }),
    "q25_pjparquet_join" -> ((s, dir) => {
      import s.implicits._
      // index-planned fact scan joined to a broadcast dimension
      pj(s, dir, "lineitem")
        .join(broadcast(pj(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"s_nationkey")
    }),
    "q60_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      // shuffle-free co-located join: both sides written bucketed on the
      // join key, so the sort-merge join needs no exchange on either side
      // (plan shape guarded by BucketedJoinSpec); the driver checks the
      // VALUES against the plain-join oracle. Decimal sums keep both
      // engines bit-identical regardless of accumulation order.
      // a fresh session's in-memory catalog doesn't know tables a previous
      // session created, so DROP alone can't clear a leftover managed
      // location — remove the directories too
      val wh = s.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
      val whDir =
        if (wh.startsWith("file:")) new java.io.File(new java.net.URI(wh))
        else new java.io.File(wh)
      def deleteRec(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
        f.delete(); ()
      }
      // table names carry a source-dir token so two sf dirs in one JVM
      // can never alias each other's bucketed fixtures
      val tok = Integer.toHexString(dir.hashCode)
      val (custT, ordT) = (s"pj_q60_cust_$tok", s"pj_q60_ord_$tok")
      fixtureDir("pj_q60_bucketed", dir) { _ =>
        for (t <- Seq(custT, ordT)) {
          s.sql(s"DROP TABLE IF EXISTS $t")
          deleteRec(new java.io.File(whDir, t))
        }
        graft.Tables.customer(s, dir).write.mode("overwrite")
          .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable(custT)
        graft.Tables.orders(s, dir).write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ordT)
      }
      s.table(ordT)
        .join(s.table(custT), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).as("price_sum"))
        .orderBy($"c_mktsegment")
    }),
    "q55_pjparquet_insert" -> ((s, dir) => {
      import s.implicits._
      // DSv2 write path: seed a pjparquet table with part of `nation`, then
      // INSERT INTO the rest through SQL; the readback below runs off the
      // sidecars the write path just produced (autogen stays enabled only
      // for the driver's re-runs). Oracle = the same aggregate over the
      // whole nation table, so the round-trip must be lossless.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q55_insert").toString
      val nation = graft.Tables.nation(s, dir)
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        nation.filter($"n_regionkey" === 0).coalesce(1), tmp)
      s.sql("DROP TABLE IF EXISTS pj_q55_t")
      s.sql(s"CREATE TABLE pj_q55_t USING pjparquet OPTIONS (path '$tmp')")
      nation.filter($"n_regionkey" =!= 0).createOrReplaceTempView("pj_q55_src")
      s.sql("INSERT INTO pj_q55_t SELECT * FROM pj_q55_src")
      s.sql("""SELECT n_regionkey, count(*) AS n_nations, sum(n_nationkey) AS key_sum
              |FROM pj_q55_t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),
    "q62_pjparquet_partitioned_insert" -> ((s, dir) => {
      import s.implicits._
      // Partitioned DSv2 write path: seed a Hive-partitioned pjparquet
      // layout with regions 0-1, INSERT the remaining regions through SQL
      // (new files must land under their key=value dirs, fully indexed),
      // then read the whole table back off the sidecars. Oracle = the same
      // aggregate over all of nation, so the partitioned round-trip must be
      // lossless. The partition column is directory-inferred as BIGINT;
      // both sides cast so the comparison is type-exact.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q62_insert").toString
      val nation = graft.Tables.nation(s, dir)
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        nation.filter($"n_regionkey" <= 1), tmp, partitionBy = Seq("n_regionkey"))
      s.sql("DROP TABLE IF EXISTS pj_q62_t")
      s.sql(s"CREATE TABLE pj_q62_t USING pjparquet OPTIONS (path '$tmp')")
      nation.filter($"n_regionkey" > 1).createOrReplaceTempView("pj_q62_src")
      s.sql("""INSERT INTO pj_q62_t
              |SELECT n_nationkey, n_name, n_regionkey FROM pj_q62_src""".stripMargin)
      s.sql("""SELECT n_regionkey, count(*) AS n_nations,
              |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
              |FROM pj_q62_t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),
    "q64_pjparquet_dynamic_overwrite" -> ((s, dir) => {
      import s.implicits._
      // SQL dynamic partition overwrite through the DSv2 BatchWrite
      // (OverwritePartitionsDynamicExec): seed a partitioned layout where
      // regions 0-1 are correct and regions >1 hold deliberately-stale rows
      // (keys shifted by +1000), then INSERT OVERWRITE only the >1 rows in
      // dynamic mode. Untouched partitions must SURVIVE (a truncate would
      // lose regions 0-1) and touched partitions must be REPLACED (an
      // append would leave the stale keys inflating key_sum) — the
      // whole-nation oracle catches either failure.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q64_dyn").toString
      val nation = graft.Tables.nation(s, dir)
      val stale = nation.filter($"n_regionkey" > 1)
        .withColumn("n_nationkey", $"n_nationkey" + 1000)
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        nation.filter($"n_regionkey" <= 1).unionAll(stale), tmp,
        partitionBy = Seq("n_regionkey"))
      s.sql("DROP TABLE IF EXISTS pj_q64_t")
      s.sql(s"CREATE TABLE pj_q64_t USING pjparquet OPTIONS (path '$tmp')")
      // The INSERT OVERWRITE must run in dynamic partition-overwrite mode;
      // run it on an isolated child session (shared catalog, private conf)
      // so the harness session's planning conf is never touched. The temp
      // view is session-scoped, so it is registered on the child.
      val iso = s.newSession()
      iso.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      graft.Tables.nation(iso, dir).filter(col("n_regionkey") > 1)
        .createOrReplaceTempView("pj_q64_src")
      iso.sql("""INSERT OVERWRITE pj_q64_t
                |SELECT n_nationkey, n_name, n_regionkey FROM pj_q64_src""".stripMargin)
      s.sql("""SELECT n_regionkey, count(*) AS n_nations,
              |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
              |FROM pj_q64_t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),
    "q125_time_travel" -> ((s, dir) => {
      import s.implicits._
      // Commit-log snapshots + time travel (PjCommitLog): v1 = the whole
      // nation table written with log.enabled, v2 = a truncate-overwrite
      // keeping only regions < 2 with keys shifted +100. HEAD must see
      // exactly v2, while versionAsOf=1 must reproduce v1 EXACTLY even
      // though the overwrite replaced the table contents — the logged
      // commit RETIRED v1's files into the snapshot history instead of
      // deleting them (reclamation is PjVacuum.expireVersions's job).
      // DuckDB recomputes both states from the source table.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q125_tt").toString
      val nation = graft.Tables.nation(s, dir)
      nation.write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp) // v1
      nation.filter($"n_regionkey" < 2)
        .withColumn("n_nationkey", ($"n_nationkey" + 100).cast("int"))
        .write.format("pjparquet").mode("overwrite").save(tmp) // v2 (log sticky)
      val head = s.read.format("pjparquet").load(tmp)
        .agg(count(lit(1)).as("head_rows"),
          sum(col("n_nationkey")).cast("long").as("head_key_sum"))
      val v1 = s.read.format("pjparquet").option("versionAsOf", "1").load(tmp)
        .agg(count(lit(1)).as("v1_rows"),
          sum(col("n_nationkey")).cast("long").as("v1_key_sum"))
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val nVersions = graft.sources.pjparquet.PjCommitLog
        .versions(fs, new org.apache.hadoop.fs.Path(tmp)).size.toLong
      v1.crossJoin(head).select(
        col("v1_rows"), col("v1_key_sum"), col("head_rows"),
        col("head_key_sum"), lit(nVersions).as("n_versions"))
    }),
    "q126_table_history" -> ((s, dir) => {
      import s.implicits._
      // DESCRIBE HISTORY over the commit log (PjCommitLog.history): three
      // deterministic commits — partitioned single-file append (k=0),
      // second append (k=1), metadata-rate DELETE of k=0 — must surface as
      // exactly three versions with the right actions and live-file
      // counts, with non-decreasing commit timestamps (wall-clock, so the
      // ts itself rides as an asserted monotonicity bit, not a value).
      val tmp = java.nio.file.Files.createTempDirectory("pj_q126_hist").toString
      val r = graft.Tables.region(s, dir)
      def slice(k: Int) = r.filter($"r_regionkey" === k)
        .withColumn("k", lit(k.toLong)).coalesce(1)
      slice(0).write.format("pjparquet").partitionBy("k")
        .option("log.enabled", "true").mode("append").save(tmp) // v1: 1 file
      slice(1).write.format("pjparquet").partitionBy("k")
        .mode("append").save(tmp)                               // v2: 2 files
      s.sql("DROP TABLE IF EXISTS pj_q126_t")
      s.sql(s"CREATE TABLE pj_q126_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q126_t WHERE k = 0")                // v3: 1 file
      s.sql("DROP TABLE IF EXISTS pj_q126_t")
      val p = new org.apache.hadoop.fs.Path(tmp)
      val hist = graft.sources.pjparquet.PjCommitLog
        .history(p.getFileSystem(s.sessionState.newHadoopConf()), p)
      val tsMonotone = hist.sliding(2).forall {
        case Seq(a, b) => a.ts <= b.ts
        case _ => true
      }
      hist.map(h => (h.version, h.action, h.nFiles))
        .toDF("version", "action", "n_files")
        .withColumn("ts_nondecreasing", lit(if (tsMonotone) 1L else 0L))
        .orderBy(col("version"))
    }),
    "q129_sql_time_travel" -> ((s, dir) => {
      import s.implicits._
      // SQL-native time travel via the path catalog (PjCatalog): Spark's
      // own `VERSION AS OF` / `TIMESTAMP AS OF` clauses route to the
      // catalog's versioned loadTable overloads and onto the commit-log
      // snapshots. Same two-version lifecycle as q125, driven purely
      // through SQL on an isolated child session (q64 convention: the
      // harness session's catalog config is never touched).
      val tmp = java.nio.file.Files.createTempDirectory("pj_q129_sqltt").toString
      val nation = graft.Tables.nation(s, dir)
      nation.write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp) // v1
      nation.filter($"n_regionkey" >= 3)
        .write.format("pjparquet").mode("overwrite").save(tmp) // v2
      val iso = s.newSession()
      iso.conf.set("spark.sql.catalog.pj", "graft.sources.pjparquet.PjCatalog")
      iso.sql(
        s"""SELECT
           |  (SELECT count(*) FROM pj.`$tmp` VERSION AS OF 1) AS v1_rows,
           |  (SELECT CAST(sum(n_nationkey) AS BIGINT)
           |     FROM pj.`$tmp` VERSION AS OF 1) AS v1_key_sum,
           |  (SELECT count(*) FROM pj.`$tmp`) AS head_rows,
           |  (SELECT CAST(sum(n_nationkey) AS BIGINT)
           |     FROM pj.`$tmp`) AS head_key_sum""".stripMargin)
    }),
    "q131_change_feed" -> ((s, dir) => {
      import s.implicits._
      // Change data feed (PjChangeFeed) over a logged copy-on-write
      // UPDATE: v1 writes nation (one file), v2 updates region-2 keys
      // (+100). The feed for v2 must surface EXACTLY the changed rows as
      // update_preimage/update_postimage pairs — rows the file-granular
      // rewrite carried over byte-identically cancel in the multiset
      // diff and must not appear. Zero write amplification: the feed is
      // computed from the retained versions' files at read time; DuckDB
      // recomputes the expected pre/postimages from the source table.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q131_cdf").toString
      graft.Tables.nation(s, dir).coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.sql("DROP TABLE IF EXISTS pj_q131_t")
      s.sql(s"CREATE TABLE pj_q131_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("UPDATE pj_q131_t SET n_nationkey = n_nationkey + 100 WHERE n_regionkey = 2") // v2
      s.sql("DROP TABLE IF EXISTS pj_q131_t")
      graft.sources.pjparquet.PjChangeFeed.changesAt(s, tmp, 2L)
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"),
          col("_change_type"), col("_commit_version").cast("long").as("_commit_version"))
        .orderBy(col("_change_type"), col("n_nationkey"))
    }),
    "q134_streaming_cdf" -> ((s, dir) => {
      import s.implicits._
      // STREAMING change data feed (cdc.enabled — Delta's
      // enableChangeDataFeed contract): the copy-on-write UPDATE persists
      // its diff as `_pj_cdc/v=2/` change files at commit time, which
      // makes the whole feed streamable from plain file scans — this
      // query actually STREAMS the persisted feed (AvailableNow → memory
      // sink) and emits the streamed rows, with a bit asserting the
      // change files really were persisted by the commit (not recomputed
      // here). DuckDB recomputes the expected pre/postimages from nation.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q134_cdc").toString
      graft.Tables.nation(s, dir).coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.sql("DROP TABLE IF EXISTS pj_q134_t")
      s.sql("CREATE TABLE pj_q134_t USING pjparquet " +
        s"OPTIONS (path '$tmp', `log.enabled` 'true', `cdc.enabled` 'true')")
      s.sql("UPDATE pj_q134_t SET n_nationkey = n_nationkey + 100 WHERE n_regionkey = 1") // v2
      s.sql("DROP TABLE IF EXISTS pj_q134_t")
      val p = new org.apache.hadoop.fs.Path(tmp)
      val fs = p.getFileSystem(s.sessionState.newHadoopConf())
      val persisted = fs.exists(
        new org.apache.hadoop.fs.Path(tmp, "_pj_cdc/v=2"))
      val cdcRoot = s"$tmp/_pj_cdc"
      val schema = s.read.parquet(cdcRoot).schema
      val tbl = s"pj_q134_out_${streamRuns.incrementAndGet()}"
      val q = s.readStream.schema(schema).parquet(cdcRoot)
        .writeStream.format("memory").queryName(tbl)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      s.table(tbl).select(
          col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"), col("_change_type"),
          col("v").cast("long").as("_commit_version"))
        .withColumn("cdc_persisted", lit(if (persisted) 1L else 0L))
        .orderBy(col("_change_type"), col("n_nationkey"))
    }),
    "q135_cdf_option_read" -> ((s, dir) => {
      import s.implicits._
      // FIRST-CLASS change-feed read surface (round 11): the whole
      // version range reads through the data source itself —
      // option("readChangeFeed", true).option("startingVersion", 1) —
      // exactly Delta's contract, with the union built server-side in ONE
      // bounded plan (one scan over all pure-add files + one diff subplan
      // for the copy-on-write DELETE; see PjChangeFeed.changes). v1
      // appends nation, v2 row-level-DELETEs region 4 (copy-on-write:
      // carried-over rows cancel in the diff), v3 appends the region-0
      // slice again. DuckDB recomputes all three versions' change rows
      // from the source table.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q135_cdf").toString
      graft.Tables.nation(s, dir).coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.sql("DROP TABLE IF EXISTS pj_q135_t")
      s.sql(s"CREATE TABLE pj_q135_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q135_t WHERE n_regionkey = 4") // v2 (copy-on-write)
      s.sql("DROP TABLE IF EXISTS pj_q135_t")
      graft.Tables.nation(s, dir).filter(col("n_regionkey") === 0).coalesce(1)
        .write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v3
      s.read.format("pjparquet")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(tmp)
        .select(col("n_nationkey").cast("int").as("n_nationkey"), col("n_name"),
          col("n_regionkey").cast("int").as("n_regionkey"),
          col("_change_type"), col("_commit_version"))
        .orderBy(col("_commit_version"), col("_change_type"), col("n_nationkey"))
    }),
    "q136_type_widening" -> ((s, dir) => {
      import s.implicits._
      // TYPE-WIDENING schema evolution (round 11): v1 writes an INT32
      // key column, `ALTER TABLE ... ALTER COLUMN k TYPE BIGINT` records
      // the widened schema as a METADATA-ONLY commit (zero files
      // rewritten), and v3 appends genuinely-64-bit values. The read
      // plans from the widened recorded schema; old INT32 files upcast
      // in the vectorized reader, and the commit path refuses lossy
      // changes. DuckDB recomputes the expected union with explicit
      // casts.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q136_widen").toString
      graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("int").as("k"), col("n_name"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1: INT32
      s.conf.set("spark.sql.catalog.pj_q136", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q136.`$tmp` ALTER COLUMN k TYPE BIGINT") // v2
      graft.Tables.nation(s, dir).filter(col("n_regionkey") === 2)
        .select((col("n_nationkey").cast("long") + 4000000000L).as("k"), col("n_name"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v3: INT64
      val t = s.read.format("pjparquet").load(tmp)
      val schemaIsLong = t.schema("k").dataType ==
        org.apache.spark.sql.types.LongType
      t.agg(
        count(lit(1)).as("n_rows"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        count(when(col("k") > 2000000000L, 1)).as("n_wide"))
        .withColumn("schema_widened", lit(if (schemaIsLong) 1L else 0L))
    }),
    "q137_sql_maintenance" -> ((s, dir) => {
      import s.implicits._
      // SQL `CALL` maintenance procedures (round 11 — Spark 4
      // ProcedureCatalog, the Iceberg-style surface): the whole
      // lifecycle scripted from pure SQL. Three logged single-file
      // appends; CALL compact merges them (a logged commit), CALL
      // history reads the per-version headers, CALL expire_versions
      // closes the time-travel window and reclaims the retired bytes,
      // CALL vacuum finds nothing left to sweep, and the table's rows
      // survive bit-exactly (DuckDB recomputes the row facts; the
      // procedure reports are engine-checked literals).
      val tmp = java.nio.file.Files.createTempDirectory("pj_q137_call").toString
      for (r <- 0 to 2)
        graft.Tables.nation(s, dir).filter(col("n_regionkey") === r)
          .coalesce(1).write.format("pjparquet")
          .mode("append").option("log.enabled", "true").save(tmp) // v1..v3
      s.conf.set("spark.sql.catalog.pj_q137", "graft.sources.pjparquet.PjCatalog")
      val comp = s.sql(s"CALL pj_q137.system.compact('$tmp')").collect().head
      val nHist = s.sql(s"CALL pj_q137.system.history('$tmp')").count()
      val exp = s.sql(s"CALL pj_q137.system.expire_versions('$tmp', 1)").collect().head
      val vac = s.sql(s"CALL pj_q137.system.vacuum('$tmp')").collect().head
      s.read.format("pjparquet").load(tmp)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_nationkey")).cast("long").as("key_sum"))
        .withColumn("small_files", lit(comp.getLong(1)))
        .withColumn("compacted_into", lit(comp.getLong(2)))
        .withColumn("versions_after_compact", lit(nHist))
        .withColumn("versions_dropped", lit(exp.getLong(0)))
        .withColumn("versions_kept", lit(exp.getLong(1)))
        .withColumn("reclaimed_ge_3", lit(if (exp.getLong(2) >= 3L) 1L else 0L))
        .withColumn("vacuum_clean", lit(if (vac.getLong(0) == 0L && vac.getLong(1) == 0L) 1L else 0L))
    }),
    "q138_drop_column" -> ((s, dir) => {
      import s.implicits._
      // DROP COLUMN as a metadata-only commit (round 11): the recorded
      // schema is authoritative for logged reads, so dropping a column
      // rewrites nothing — pre-drop files keep the bytes (time travel
      // before the drop still serves them), the head read simply never
      // requests the column, and post-drop appends carry the narrowed
      // schema. DuckDB recomputes the row facts and the pre-drop
      // distinct-name count.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q138_drop").toString
      graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"), col("n_name"),
          col("n_regionkey").cast("long").as("r"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.conf.set("spark.sql.catalog.pj_q138", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q138.`$tmp` DROP COLUMN n_name") // v2: metadata-only
      graft.Tables.nation(s, dir).filter(col("n_regionkey") === 1)
        .select((col("n_nationkey").cast("long") + 100L).as("k"),
          col("n_regionkey").cast("long").as("r"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v3
      val head = s.read.format("pjparquet").load(tmp)
      val v1Names = s.read.format("pjparquet")
        .option("versionAsOf", "1").load(tmp)
        .agg(countDistinct(col("n_name"))).head().getLong(0)
      head.agg(
          count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("k_sum"))
        .withColumn("n_cols_after_drop", lit(head.columns.length.toLong))
        .withColumn("v1_distinct_names", lit(v1Names))
    }),
    "q139_add_column" -> ((s, dir) => {
      import s.implicits._
      // ADD COLUMN as a metadata-only commit (round 11): pre-add files
      // null-fill the new column at read, post-add appends may carry OR
      // omit it (omitting writers' files null-fill too — Delta append
      // semantics), and the recorded schema keeps the added column
      // either way. DuckDB recomputes the union with explicit NULLs.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q139_add").toString
      graft.Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("k"),
          col("n_regionkey").cast("long").as("r"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.conf.set("spark.sql.catalog.pj_q139", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q139.`$tmp` ADD COLUMN tag STRING") // v2: metadata-only
      graft.Tables.nation(s, dir).filter(col("n_regionkey") === 0)
        .select((col("n_nationkey").cast("long") + 100L).as("k"),
          col("n_regionkey").cast("long").as("r"),
          col("n_name").as("tag"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v3: carries tag
      graft.Tables.nation(s, dir).filter(col("n_regionkey") === 2)
        .select((col("n_nationkey").cast("long") + 200L).as("k"),
          col("n_regionkey").cast("long").as("r"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v4: omits tag
      val head = s.read.format("pjparquet").load(tmp)
      head.agg(
          count(lit(1)).as("n_rows"),
          sum(col("k")).cast("long").as("k_sum"),
          count(col("tag")).as("tag_non_null"),
          countDistinct(col("tag")).as("tag_distinct"))
        .withColumn("n_cols", lit(head.columns.length.toLong))
    }),
    "q140_dv_delete" -> ((s, dir) => {
      import s.implicits._
      // Merge-on-read DELETE via deletion vectors (round 11, PjDvDelete):
      // a data-predicate DELETE on a logged table writes per-file position
      // vectors instead of rewriting files — ONE commit, zero data files
      // rewritten, reads filter positions columnar-side, count(*) stays
      // metadata-rate (rows − vector cardinality), and a second DELETE
      // merges vectors. DuckDB recomputes the surviving aggregation; the
      // no-rewrite/one-vector-per-file facts ride as asserted bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q140_dv").toString
      graft.Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          round($"o_totalprice" * 100).cast("long").as("price_cents"))
        .repartition(4).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1: 4 files
      s.sql("DROP TABLE IF EXISTS pj_q140_t")
      s.sql(s"CREATE TABLE pj_q140_t USING pjparquet OPTIONS (path '$tmp')")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = new org.apache.hadoop.fs.Path(tmp)
      val before = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
        .entries.map(_.path).toSet
      s.sql("DELETE FROM pj_q140_t WHERE o_orderstatus = 'F' AND price_cents < 15000000")
      s.sql("DELETE FROM pj_q140_t WHERE o_custkey <= 50") // merges vectors
      val head = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
      val noRewrite = head.entries.forall(e => before.contains(e.path))
      val oneCommitEach = head.version == 3L
      val dvCount = head.entries.count(_.dv.isDefined).toLong
      s.table("pj_q140_t")
        .groupBy($"o_orderstatus").agg(
          count(lit(1)).as("n_orders"),
          sum($"o_orderkey").cast("long").as("key_sum"),
          sum($"price_cents").cast("long").as("cents_sum"))
        .withColumn("no_file_rewritten", lit(if (noRewrite) 1L else 0L))
        .withColumn("two_dv_commits", lit(if (oneCommitEach) 1L else 0L))
        .withColumn("files_with_vectors", lit(dvCount))
    }),
    "q141_mor_update" -> ((s, dir) => {
      import s.implicits._
      // Merge-on-read UPDATE via SupportsDelta (round 11, PjDeltaWrite):
      // matched rows retire by POSITION (deletion vectors, merged across
      // tasks and with prior vectors) while updated rows append as new
      // files — base files keep their bytes. A follow-up MERGE upserts
      // through the same delta write. DuckDB recomputes the final state;
      // the no-rewrite/vector facts ride as asserted bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q141_mor").toString
      graft.Tables.customer(s, dir)
        .select($"c_custkey", $"c_nationkey",
          round($"c_acctbal" * 100).cast("long").as("bal_cents"))
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      s.sql("DROP TABLE IF EXISTS pj_q141_t")
      s.sql(s"CREATE TABLE pj_q141_t USING pjparquet OPTIONS (path '$tmp')")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = new org.apache.hadoop.fs.Path(tmp)
      val baseFiles = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
        .entries.map(_.path).toSet
      // UPDATE negative balances to zero (merge-on-read)
      s.sql("UPDATE pj_q141_t SET bal_cents = 0 WHERE bal_cents < 0")
      // MERGE: every 7th customer re-doubles its ORIGINAL (floored)
      // balance — every source key matches, exercising the matched-update
      // delta path on both the base file and the v2 update files
      graft.Tables.customer(s, dir)
        .filter($"c_custkey" % 7 === 0)
        .select($"c_custkey", $"c_nationkey",
          round($"c_acctbal" * 100).cast("long").as("bal_cents"))
        .createOrReplaceTempView("pj_q141_src")
      s.sql(
        """MERGE INTO pj_q141_t AS t USING pj_q141_src AS s ON t.c_custkey = s.c_custkey
          |WHEN MATCHED THEN UPDATE SET bal_cents = 2 * GREATEST(s.bal_cents, 0)
          |WHEN NOT MATCHED THEN INSERT * """.stripMargin)
      val head = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
      val baseKept = baseFiles.subsetOf(head.entries.map(_.path).toSet)
      val baseHasDv = head.entries.exists(e => baseFiles.contains(e.path) && e.dv.isDefined)
      s.table("pj_q141_t")
        .groupBy($"c_nationkey").agg(
          count(lit(1)).as("n_cust"),
          sum($"bal_cents").cast("long").as("cents_sum"),
          sum(when($"bal_cents" === 0, 1L).otherwise(0L)).as("n_zeroed"))
        .withColumn("base_files_kept", lit(if (baseKept) 1L else 0L))
        .withColumn("base_has_vectors", lit(if (baseHasDv) 1L else 0L))
    }),
    "q142_dedup_in_place" -> ((s, dir) => {
      import s.implicits._
      // In-place corpus dedup via deletion vectors (round 11,
      // PipelineOps.dedupInPlace): documents duplicated 3 ways into a
      // logged table, then deduped BY CONTENT with one window + one
      // vector commit — zero files rewritten, exactly one representative
      // per distinct text survives. DuckDB recomputes the distinct facts.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q142_dedup").toString
      val docs = graft.Tables.documents(s, dir)
        .select($"doc_id".cast("long").as("doc_id"), $"text")
      docs.unionAll(docs.limit(40)).unionAll(docs.limit(15))
        .repartition(3).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1: with dups
      val files = {
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sessionState.newHadoopConf())
        graft.sources.pjparquet.PjCommitLog.latest(
          fs, new org.apache.hadoop.fs.Path(tmp)).get.entries.map(_.path).toSet
      }
      val (v, removed) = PipelineOps.dedupInPlace(s, tmp, Seq("text"))
      val fs2 = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val head = graft.sources.pjparquet.PjCommitLog.latest(
        fs2, new org.apache.hadoop.fs.Path(tmp)).get
      val noRewrite = head.entries.forall(e => files.contains(e.path))
      // exact expected removal count: (base + 55 planted dups) minus one
      // representative per distinct text
      val expectRemoved =
        docs.count() + 55L - docs.select($"text").distinct().count()
      val t = s.read.format("pjparquet").load(tmp)
      t.agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"text").as("n_distinct_text"))
        .withColumn("dedup_exact", lit(if (v.isDefined) 1L else 0L))
        .withColumn("no_file_rewritten", lit(if (noRewrite) 1L else 0L))
        .withColumn("removed_matches", lit(if (removed == expectRemoved) 1L else 0L))
    }),
    "q143_restore" -> ((s, dir) => {
      import s.implicits._
      // RESTORE TABLE TO VERSION AS OF (round 12, PjRestore): v1 appends
      // nation, v2 appends a +100-key copy, v3 DV-DELETEs keys < 5, v4
      // appends a +200-key copy; CALL restore(2) turns HEAD back into v2
      // with ONE metadata commit — the DV reference rolls back (deleted
      // rows resurrect with zero data I/O), v4's file retires, history
      // gains a "restore" version, and time travel to v3/v4 still works.
      // DuckDB recomputes the v2 row facts; the protocol facts ride as
      // asserted bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q143_restore").toString
      val nation = graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name", $"n_regionkey")
      nation.coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      nation.withColumn("k", $"k" + 100L).coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp) // v2
      s.sql("DROP TABLE IF EXISTS pj_q143_t")
      s.sql(s"CREATE TABLE pj_q143_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q143_t WHERE k < 5") // v3: deletion vectors
      nation.withColumn("k", $"k" + 200L).coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp) // v4
      s.conf.set("spark.sql.catalog.pj_q143", "graft.sources.pjparquet.PjCatalog")
      // the restore verb runs through its SQL STATEMENT face (round 17):
      // RESTORE TABLE t TO VERSION AS OF n — same report as the CALL form
      val rep = sqlStatementSession(s)
        .sql(s"RESTORE TABLE '$tmp' TO VERSION AS OF 2").collect().head
      val v2 = s.read.format("pjparquet").option("versionAsOf", "2").load(tmp)
        .select($"k").as[Long].collect().sorted.toSeq
      val headKeys = s.read.format("pjparquet").load(tmp)
        .select($"k").as[Long].collect().sorted.toSeq
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val hist = graft.sources.pjparquet.PjCommitLog.history(
        fs, new org.apache.hadoop.fs.Path(tmp))
      val v3Rows = s.read.format("pjparquet").option("versionAsOf", "3").load(tmp).count()
      val v4Rows = s.read.format("pjparquet").option("versionAsOf", "4").load(tmp).count()
      s.read.format("pjparquet").load(tmp)
        .agg(count(lit(1)).as("n_rows"), sum($"k").cast("long").as("key_sum"))
        .withColumn("head_equals_v2", lit(if (headKeys == v2) 1L else 0L))
        .withColumn("restore_committed_v5",
          lit(if (rep.getLong(1) == 5L && rep.getLong(0) == 2L) 1L else 0L))
        .withColumn("history_has_restore",
          lit(if (hist.exists(h => h.version == 5L && h.action == "restore")) 1L else 0L))
        .withColumn("time_travel_intact",
          lit(if (v3Rows == v2.size - 5L && v4Rows == v2.size + 20L) 1L else 0L))
    }),
    "q144_merge_evolution" -> ((s, dir) => {
      import s.implicits._
      // MERGE WITH SCHEMA EVOLUTION (round 12): the source carries a
      // column the target lacks; Spark's ResolveMergeIntoSchemaEvolution
      // sees the table's AUTOMATIC_SCHEMA_EVOLUTION capability and calls
      // PjCatalog.alterTable (metadata-only ADD COLUMN commit), then the
      // merge-on-read delta lands on the evolved schema in the same
      // statement — matched rows update, unmatched insert WITH the new
      // column, pre-existing rows null-fill. Without the clause the same
      // merge refuses at analysis. DuckDB recomputes the full-outer-merge
      // facts per segment.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q144_mse").toString
      val cust = graft.Tables.customer(s, dir)
      cust.filter($"c_custkey" % 3 === 0)
        .select($"c_custkey", round($"c_acctbal" * 100).cast("long").as("cents"))
        .coalesce(2).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      cust.filter($"c_custkey" % 2 === 0)
        .select($"c_custkey",
          (round($"c_acctbal" * 100).cast("long") * 2).as("cents"),
          $"c_mktsegment".as("segment"))
        .createOrReplaceTempView("pj_q144_src")
      s.conf.set("spark.sql.catalog.pj_q144", "graft.sources.pjparquet.PjCatalog")
      // without the clause, naming the source-only column refuses at
      // analysis (star actions without it silently DROP extra source
      // columns — Spark's star expands to the target's columns)
      val refused =
        try {
          s.sql(
            s"""MERGE INTO pj_q144.`$tmp` AS t USING pj_q144_src AS s
               |ON t.c_custkey = s.c_custkey
               |WHEN MATCHED THEN UPDATE SET t.segment = s.segment
               |""".stripMargin)
          0L
        } catch { case _: org.apache.spark.sql.AnalysisException => 1L }
      s.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO pj_q144.`$tmp` AS t
           |USING pj_q144_src AS s ON t.c_custkey = s.c_custkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val hist = graft.sources.pjparquet.PjCommitLog.history(
        fs, new org.apache.hadoop.fs.Path(tmp))
      s.read.format("pjparquet").load(tmp)
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_cust"),
          sum($"cents").cast("long").as("cents_sum"),
          sum($"c_custkey").cast("long").as("key_sum"))
        .withColumn("refused_without_clause", lit(refused))
        .withColumn("evolution_commit_recorded",
          lit(if (hist.exists(_.action == "alter-schema")) 1L else 0L))
        .orderBy($"segment")
    }),
    "q145_check_constraints" -> ((s, dir) => {
      import s.implicits._
      // Write-side CHECK constraints (round 12, PjConstraints): recorded
      // in the log by ALTER TABLE ADD CONSTRAINT, enforced task-side by
      // Spark's CheckInvariant inside every v2 write — a violating append
      // FAILS THE JOB and commits nothing, a clean append lands, and
      // adding a constraint existing rows violate refuses with the
      // violation count. DuckDB recomputes the surviving row facts.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q145_chk").toString
      val orders = graft.Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderstatus",
          round($"o_totalprice" * 100).cast("long").as("price_cents"))
      orders.filter($"o_orderkey" % 2 === 0).coalesce(2)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp) // v1
      s.conf.set("spark.sql.catalog.pj_q145", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q145.`$tmp` ADD CONSTRAINT price_nonneg " +
        "CHECK (price_cents >= 0)") // v2: metadata-only
      val violatingRefused =
        try {
          Seq((-1L, "X", -500L)).toDF("o_orderkey", "o_orderstatus", "price_cents")
            .coalesce(1).write.format("pjparquet").mode("append").save(tmp)
          0L
        } catch { case _: Exception => 1L }
      val preexistingRefused =
        try {
          s.sql(s"ALTER TABLE pj_q145.`$tmp` ADD CONSTRAINT impossible " +
            "CHECK (price_cents > 1000000000000)")
          0L
        } catch { case _: Exception => 1L }
      orders.filter($"o_orderkey" % 2 === 1).coalesce(2)
        .write.format("pjparquet").mode("append").save(tmp) // clean append lands
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val head = graft.sources.pjparquet.PjCommitLog.latest(
        fs, new org.apache.hadoop.fs.Path(tmp)).get
      s.read.format("pjparquet").load(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum($"price_cents").cast("long").as("cents_sum"))
        .withColumn("violating_write_refused", lit(violatingRefused))
        .withColumn("preexisting_violation_refused", lit(preexistingRefused))
        .withColumn("constraint_recorded",
          lit(if (graft.sources.pjparquet.PjConstraints.parse(head.constraintsJson)
            .exists(_.name == "price_nonneg")) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q146_rename_column" -> ((s, dir) => {
      import s.implicits._
      // RENAME COLUMN via column mapping (round 12, PjColumnMapping —
      // Delta `name` mode): the rename is a metadata-only commit pinning
      // the frozen physical name; pre-rename files keep serving, the
      // post-rename append physically stores the OLD name (generations
      // stay uniform), filters/aggregates on the new logical name answer
      // exactly, and a stale writer naming the old column refuses.
      // DuckDB recomputes the merged-generation facts.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q146_rename").toString
      val part = graft.Tables.part(s, dir)
        .select($"p_partkey", $"p_type",
          round($"p_retailprice" * 100).cast("long").as("price_cents"))
      part.filter($"p_partkey" % 2 === 0).coalesce(1)
        .write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp) // v1: even keys, old name
      s.conf.set("spark.sql.catalog.pj_q146", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q146.`$tmp` RENAME COLUMN price_cents TO cents") // v2
      part.filter($"p_partkey" % 2 === 1)
        .withColumnRenamed("price_cents", "cents").coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp) // v3: odd keys, new name
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val head = graft.sources.pjparquet.PjCommitLog.latest(
        fs, new org.apache.hadoop.fs.Path(tmp)).get
      // the post-rename file physically stores the FROZEN old name
      val newFileUniform = head.entries.forall(e =>
        s.read.parquet(s"$tmp/${e.path}").columns.contains("price_cents"))
      val staleRefused =
        try {
          part.filter($"p_partkey" === 1).coalesce(1)
            .write.format("pjparquet").mode("append").save(tmp)
          0L
        } catch { case _: Exception => 1L }
      s.read.format("pjparquet").load(tmp)
        .groupBy(substring($"p_type", 1, 6).as("type_prefix"))
        .agg(count(lit(1)).as("n_parts"),
          sum($"cents").cast("long").as("cents_sum"),
          sum($"p_partkey").cast("long").as("key_sum"))
        .withColumn("physically_uniform", lit(if (newFileUniform) 1L else 0L))
        .withColumn("stale_writer_refused", lit(staleRefused))
        .orderBy($"type_prefix")
    }),
    "q147_table_properties" -> ((s, dir) => {
      import s.implicits._
      // PERSISTED TABLE PROPERTIES (round 12, PjTableProperties — Delta
      // TBLPROPERTIES parity): SET TBLPROPERTIES is a metadata-only
      // commit in the log; the recorded `pj.changeFeed.enabled` contract
      // makes a later DELETE persist its change rows with NO per-write
      // option (the table, not each caller, owns the behavior); the
      // recorded `pj.checkpoint.interval` drives the checkpoint cadence;
      // a reserved-namespace typo refuses at DDL time; SHOW
      // TBLPROPERTIES reads the map back. DuckDB recomputes the
      // surviving-row facts and the delete-change-row count.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q147_props").toString
      val cust = graft.Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment",
          round($"c_acctbal" * 100).cast("long").as("cents"))
      cust.coalesce(2).write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp) // v1
      s.conf.set("spark.sql.catalog.pj_q147", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"ALTER TABLE pj_q147.`$tmp` SET TBLPROPERTIES(" +
        "'pj.changeFeed.enabled'='true', 'pj.checkpoint.interval'='3', " +
        "'team'='data-eng')") // v2: metadata-only
      s.sql(s"DELETE FROM pj_q147.`$tmp` WHERE c_custkey % 5 = 0") // v3: DV delete
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = new org.apache.hadoop.fs.Path(tmp)
      val v1 = graft.sources.pjparquet.PjCommitLog.read(fs, root, 1L)
      val v2 = graft.sources.pjparquet.PjCommitLog.read(fs, root, 2L)
      val metadataOnly = v2.entries.map(_.path) == v1.entries.map(_.path) &&
        v2.action == "alter-properties"
      val cdcPersisted = fs.exists(new org.apache.hadoop.fs.Path(tmp, "_pj_cdc"))
      val ckptAtInterval = fs.exists(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(tmp, "_pj_log"), f"${3L}%020d.checkpoint.json"))
      val typoRefused =
        try {
          s.sql(s"ALTER TABLE pj_q147.`$tmp` SET TBLPROPERTIES(" +
            "'pj.changeFeed.enabld'='true')")
          0L
        } catch { case _: Exception => 1L }
      val shown = s.sql(s"SHOW TBLPROPERTIES pj_q147.`$tmp`")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val showOk = shown.get("team").contains("data-eng") &&
        shown.get("pj.changeFeed.enabled").contains("true")
      val nDeleteChanges = s.read.format("pjparquet")
        .option("readChangeFeed", "true").option("startingVersion", "3").load(tmp)
        .filter($"_change_type" === "delete").count()
      s.read.format("pjparquet").load(tmp)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"), sum($"cents").cast("long").as("cents_sum"))
        .withColumn("properties_commit_metadata_only", lit(if (metadataOnly) 1L else 0L))
        .withColumn("cdc_persisted_by_property", lit(if (cdcPersisted) 1L else 0L))
        .withColumn("n_delete_change_rows", lit(nDeleteChanges))
        .withColumn("checkpoint_at_interval", lit(if (ckptAtInterval) 1L else 0L))
        .withColumn("typo_refused", lit(typoRefused))
        .withColumn("show_reads_back", lit(if (showOk) 1L else 0L))
        .orderBy($"c_mktsegment")
    }),
    "q148_shallow_clone" -> ((s, dir) => {
      import s.implicits._
      // SHALLOW CLONE (round 12, PjClone): zero-copy fork — `CALL
      // pj.system.clone` commits ONE metadata entry in the new table
      // referencing the source snapshot's files absolutely (no data file
      // is copied), then a DELETE on the clone writes deletion vectors
      // under the CLONE's root only. Facts checked: zero data files
      // copied at clone time, source row count unchanged after the
      // clone's DELETE, clone aggregates reflect only its own DML.
      // DuckDB recomputes the surviving-clone aggregate and source count.
      val src = java.nio.file.Files.createTempDirectory("pj_q148_src").toString
      val tgtDir = java.nio.file.Files.createTempDirectory("pj_q148_tgt")
      java.nio.file.Files.delete(tgtDir) // clone requires a fresh target
      val tgt = tgtDir.toString
      val ord = graft.Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderpriority",
          round($"o_totalprice" * 100).cast("long").as("cents"))
      ord.repartition(2).write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(src)
      s.conf.set("spark.sql.catalog.pj_q148", "graft.sources.pjparquet.PjCatalog")
      val cloneRow = s.sql(
        s"CALL pj_q148.system.clone(source => '$src', target => '$tgt')")
        .collect().head
      val clonedFiles = cloneRow.getLong(1)
      // no .parquet data bytes under the clone — only its log
      val tfs = new org.apache.hadoop.fs.Path(tgt)
        .getFileSystem(s.sessionState.newHadoopConf())
      var copied = 0L
      val it = tfs.listFiles(new org.apache.hadoop.fs.Path(tgt), true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
          !st.getPath.toString.contains("_pj_log")) copied += 1
      }
      s.sql(s"DELETE FROM pj_q148.`$tgt` WHERE o_orderkey % 3 = 0")
      val srcRows = s.read.format("pjparquet").load(src).count()
      s.read.format("pjparquet").load(tgt)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum($"cents").cast("long").as("cents_sum"))
        .withColumn("files_copied_at_clone", lit(copied))
        .withColumn("cloned_file_refs", lit(clonedFiles))
        .withColumn("source_rows_after_clone_dml", lit(srcRows))
        .orderBy($"o_orderpriority")
    }),
    "q149_analyze_cbo_stats" -> ((s, dir) => {
      import s.implicits._
      // ANALYZE + CBO statistics (round 12, PjAnalyze): `CALL
      // pj.system.analyze` computes per-column NDV/nulls/lengths/min-max
      // in ONE pass, records them as a metadata-only commit, and every
      // scan then serves them to Spark's optimizer via DSv2
      // `columnStats()` — checked here by reading the optimized plan's
      // attributeStats. DuckDB recomputes the exact facts (null counts,
      // byte lengths, min/max); the HLL NDV is checked as exact for the
      // low-cardinality column and within 5 % for the key column.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q149_analyze").toString
      val cust = graft.Tables.customer(s, dir)
        .select($"c_custkey", $"c_mktsegment",
          round($"c_acctbal" * 100).cast("long").as("cents"))
      cust.coalesce(2).write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(tmp)
      s.conf.set("spark.sql.catalog.pj_q149", "graft.sources.pjparquet.PjCatalog")
      val statRows = s.sql(s"CALL pj_q149.system.analyze(table => '$tmp')")
        .collect().map(r => r.getString(0) -> r).toMap
      val nRows = statRows.values.head.getLong(7)
      val df = s.read.format("pjparquet").load(tmp)
      val attrStats = df.queryExecution.optimizedPlan.collectLeaves()
        .head.stats.attributeStats
      val cboVisible = if (attrStats.nonEmpty) 1L else 0L
      val out = statRows.toSeq.map { case (name, r) =>
        val ndv = r.getLong(1)
        val ndvExact = if (name == "c_mktsegment") ndv else -1L
        val within5 =
          if (name == "c_custkey")
            (if (math.abs(ndv - nRows) <= nRows / 20) 1L else 0L)
          else 1L
        (name, r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.getString(5)).orNull, Option(r.getString(6)).orNull,
          ndvExact, within5, cboVisible, nRows)
      }
      out.toDF("column", "null_count", "avg_len", "max_len", "min_s", "max_s",
        "ndv_exact", "ndv_within_5pct", "cbo_visible", "table_rows")
        .orderBy($"column")
    }),
    "q150_create_generated_identity" -> ((s, dir) => {
      import s.implicits._
      // CREATE TABLE DDL + generated/identity columns (round 12,
      // PjCatalog.createTable + PjGenerated): an empty logged table is
      // created by DDL with an identity key, a generated column and a
      // DEFAULT; the insert OMITS all three — the writer assigns identity
      // values from the watermark (base + k*step, unique), computes the
      // generation expression, and Spark fills the DEFAULT. An UPDATE on
      // a base column then recomputes its generated dependent. DuckDB
      // recomputes every fact from customer.
      val tgtDir = java.nio.file.Files.createTempDirectory("pj_q150_ddl")
      java.nio.file.Files.delete(tgtDir)
      val tgt = tgtDir.toString
      s.conf.set("spark.sql.catalog.pj_q150", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"""CREATE TABLE pj_q150.`$tgt` (
        |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 10),
        |  c_mktsegment STRING,
        |  cents BIGINT,
        |  cents_doubled BIGINT GENERATED ALWAYS AS (cents * 2),
        |  tag STRING DEFAULT 'raw'
        |) USING pjparquet""".stripMargin)
      graft.Tables.customer(s, dir)
        .select($"c_mktsegment",
          round($"c_acctbal" * 100).cast("long").as("cents"))
        .coalesce(1) // dense identity run: ids are exactly 100, 110, ...
        .write.format("pjparquet").mode("append").save(tgt)
      s.sql(s"UPDATE pj_q150.`$tgt` SET cents = cents + 1 WHERE c_mktsegment = 'BUILDING'")
      val t = s.read.format("pjparquet").load(tgt)
      val idsUnique = t.select(countDistinct($"id")).as[Long].head() == t.count()
      val inProgression =
        t.where(($"id" - 100) % 10 =!= 0 || $"id" < 100).count() == 0L
      t.groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum($"cents_doubled").cast("long").as("cents2_sum"),
          min($"tag").as("tag_min"))
        .withColumn("ids_unique", lit(if (idsUnique) 1L else 0L))
        .withColumn("ids_in_progression", lit(if (inProgression) 1L else 0L))
        .orderBy($"c_mktsegment")
    }),
    "q155_row_tracking" -> ((s, dir) => {
      import s.implicits._
      // Stable row ids (round 13, Delta-style row tracking): appends mint
      // disjoint `_row_id` ranges from a log watermark; a DV delete keeps
      // survivors' ids; compaction MATERIALIZES ids so they survive the
      // rewrite — and the change feed then skips that version at metadata
      // rate (no multiset diff, no data scan). DuckDB recomputes the
      // surviving row facts; the id-stability facts are engine-checked
      // bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q155_rt").toString
      val src = graft.Tables.supplier(s, dir)
        .select($"s_suppkey".cast("long").as("k"), $"s_nationkey".cast("long").as("n"))
      src.filter($"k" % 2 === 0).coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      src.filter($"k" % 2 === 1).coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v2
      def ids(): Map[Long, Long] = s.read.format("pjparquet").load(tmp)
        .selectExpr("k", "_row_id").as[(Long, Long)].collect().toMap
      val before = ids()
      s.conf.set("spark.sql.catalog.pj_q155", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"DROP TABLE IF EXISTS pj_q155_t")
      s.sql(s"CREATE TABLE pj_q155_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q155_t WHERE k % 7 = 0") // v3: deletion vector
      val afterDelete = ids()
      val dvKeptIds = afterDelete.forall { case (k, rid) => before(k) == rid }
      graft.sources.pjparquet.PjCompaction.compact(
        s, tmp, targetBytes = 512L * 1024 * 1024) // v4: id-preserving rewrite
      val afterCompact = ids()
      val compactKeptIds = afterCompact == afterDelete
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = new org.apache.hadoop.fs.Path(tmp)
      val head = graft.sources.pjparquet.PjCommitLog.versions(fs, root).last
      val preserved = graft.sources.pjparquet.PjCommitLog.delta(fs, root, head).preservedRows
      val cdf = graft.sources.pjparquet.PjChangeFeed.changesAt(s, tmp, head)
      val cdfEmptyNoScan = cdf.count() == 0L && {
        val plan = cdf.queryExecution.executedPlan.toString
        !plan.toLowerCase.contains("pjparquet") || plan.contains("Empty")
      }
      // COPY-ON-WRITE leg (round 14): with deletion vectors disabled, UPDATE
      // and DELETE rewrite whole files — the rewrite must MATERIALIZE the
      // surviving rows' ids (like compaction) instead of reminting them
      s.sql(s"DROP TABLE IF EXISTS pj_q155_cow")
      s.sql(s"CREATE TABLE pj_q155_cow USING pjparquet " +
        s"OPTIONS (path '$tmp', `deletionVectors.enabled` 'false')")
      s.sql("UPDATE pj_q155_cow SET n = n + 1000 WHERE k % 5 = 0") // v5: CoW rewrite
      val afterCowUpdate = ids()
      val cowUpdateKeptIds = afterCowUpdate == afterCompact
      s.sql("DELETE FROM pj_q155_cow WHERE k % 11 = 0") // v6: CoW delete
      val afterCowDelete = ids()
      // sf-robust: the survivor set must be EXACTLY the non-matching keys
      // (at tiny SFs the predicate may match zero rows — still a valid run)
      val cowDeleteKeptIds = afterCowDelete.forall { case (k, rid) =>
        afterCompact(k) == rid
      } && afterCowDelete.size == afterCowUpdate.count { case (k, _) => k % 11 != 0 }
      val uniqueIds = afterCowDelete.values.toSeq.distinct.size == afterCowDelete.size
      s.sql(s"DROP TABLE IF EXISTS pj_q155_t")
      s.sql(s"DROP TABLE IF EXISTS pj_q155_cow")
      s.read.format("pjparquet").load(tmp)
        .groupBy($"n")
        .agg(count(lit(1)).as("n_supp"), sum($"k").as("key_sum"))
        .withColumn("dv_kept_ids", lit(if (dvKeptIds) 1L else 0L))
        .withColumn("compact_kept_ids", lit(if (compactKeptIds) 1L else 0L))
        .withColumn("compact_preserved_rows", lit(if (preserved) 1L else 0L))
        .withColumn("compact_cdf_empty_no_scan", lit(if (cdfEmptyNoScan) 1L else 0L))
        .withColumn("cow_update_kept_ids", lit(if (cowUpdateKeptIds) 1L else 0L))
        .withColumn("cow_delete_kept_ids", lit(if (cowDeleteKeptIds) 1L else 0L))
        .withColumn("ids_unique", lit(if (uniqueIds) 1L else 0L))
        .orderBy($"n")
    }),
    "q156_add_column_default" -> ((s, dir) => {
      import s.implicits._
      // ADD COLUMN ... DEFAULT (round 14, existence defaults): pre-add
      // files serve the default instead of null (the vectorized reader's
      // existence-default lane over the recorded field metadata), post-add
      // writes that omit the column fill the same way, SQL INSERTs resolve
      // it via Spark's own default resolution, and explicit values —
      // including explicit NULL — win. DuckDB recomputes every value;
      // the narrow pre-add time-travel schema rides as an asserted bit.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q156_def")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      val nation = graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"))
      s.conf.set("spark.sql.catalog.pj_q156", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q156.`$tmp` (k BIGINT, name STRING) USING pjparquet")
      nation.filter($"k" % 2 === 0).coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp) // pre-add files
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val preAddVersion = graft.sources.pjparquet.PjCommitLog
        .latest(fs, new org.apache.hadoop.fs.Path(tmp)).get.version
      s.sql(s"ALTER TABLE pj_q156.`$tmp` ADD COLUMN bonus BIGINT DEFAULT 7")
      // pre-add rows read the default, not null
      val preAddDefault = s.read.format("pjparquet").load(tmp)
        .filter($"bonus" === 7L).count() ==
        s.read.format("pjparquet").load(tmp).count()
      // post-add append OMITTING the column: same fill
      nation.filter($"k" % 2 === 1).coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp)
      // SQL INSERT with explicit values; explicit NULL wins over the default
      nation.filter($"k" % 5 === 0)
        .selectExpr("k + 1000 AS k", "name",
          "CASE WHEN k % 10 = 0 THEN NULL ELSE k * 10 END AS bonus")
        .createOrReplaceTempView("pj_q156_src")
      s.sql(s"INSERT INTO pj_q156.`$tmp` SELECT k, name, bonus FROM pj_q156_src")
      // time travel BEFORE the add serves that version's schema (no bonus)
      val narrowPreAdd = s.read.format("pjparquet")
        .option("versionAsOf", preAddVersion.toString).load(tmp)
        .columns.toSeq == Seq("k", "name")
      s.read.format("pjparquet").load(tmp)
        .select($"k", $"name", $"bonus")
        .withColumn("pre_add_default", lit(if (preAddDefault) 1L else 0L))
        .withColumn("narrow_pre_add_schema", lit(if (narrowPreAdd) 1L else 0L))
        .orderBy($"k")
    }),
    "q158_scoped_compaction" -> ((s, dir) => {
      import s.implicits._
      // OPTIMIZE ... WHERE (round 14, predicate-scoped compaction): at
      // 100 TB nobody compacts the whole table in one maintenance window
      // — the operational unit is one partition. A partition predicate
      // scopes the rewrite; out-of-scope partitions stay byte-untouched
      // (file-identity bits), content is DuckDB-recomputed, and a
      // non-partition-column predicate refuses loudly.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q158_scoped")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      val src = graft.Tables.supplier(s, dir)
        .select($"s_suppkey".cast("long").as("k"),
          $"s_nationkey".cast("long").as("n"),
          ($"s_suppkey" % 3).cast("string").as("flag"))
      // four separate appends -> a small-file backlog in EVERY partition
      // (one append writes one file per partition dir: the write clusters
      // on the partition key)
      (0L until 4L).foreach { i =>
        src.filter($"k" % 4 === i)
          .write.format("pjparquet").mode("append")
          .option("log.enabled", "true").partitionBy("flag").save(tmp)
      }
      // LIVE snapshot membership (a logged compaction RETIRES consumed
      // files in the log; the bytes stay on disk for time travel)
      val fsQ = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      def live(prefix: String): Set[String] =
        graft.sources.pjparquet.PjCommitLog
          .latest(fsQ, new org.apache.hadoop.fs.Path(tmp)).get
          .files.filter(_.startsWith(prefix)).toSet
      val before0 = live("flag=0/"); val before1 = live("flag=1/"); val before2 = live("flag=2/")
      val report = graft.sources.pjparquet.PjCompaction.compact(
        s, tmp, targetBytes = 512L * 1024 * 1024, where = Some("flag = '1'"))
      val scopedOnly = report.dirsTouched == 1 &&
        live("flag=0/") == before0 && live("flag=2/") == before2 &&
        live("flag=1/").size < before1.size
      val refused =
        try { graft.sources.pjparquet.PjCompaction.compact(
          s, tmp, where = Some("n > 5")); false }
        catch { case e: graft.core.PJException =>
          e.getMessage.contains("partition columns only") }
      s.read.format("pjparquet").load(tmp)
        // partition inference types the dir values as ints — re-cast to
        // the declared string so the oracle's VARCHAR column matches
        .groupBy($"flag".cast("string").as("flag"))
        .agg(count(lit(1)).as("n_supp"), sum($"k").as("key_sum"), sum($"n").as("nat_sum"))
        .withColumn("scoped_only", lit(if (scopedOnly) 1L else 0L))
        .withColumn("nonpartition_refused", lit(if (refused) 1L else 0L))
        .orderBy($"flag")
    }),
    "q159_merge_by_source" -> ((s, dir) => {
      import s.implicits._
      // MERGE INTO with WHEN NOT MATCHED BY SOURCE (round 14): the
      // clauses that act on TARGET rows the source never mentions — the
      // shape incremental-sync pipelines use ("source is the new truth;
      // delete or demote whatever it dropped"). Target = every 3rd
      // customer; source = every 2nd with a 100k-cent bonus. Matched
      // rows take the source balance, unmatched source rows insert, and
      // by-source rows (in target, absent from source) DELETE when
      // c_nationkey < 10 and zero their balance otherwise.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q159_mbs").toString
      val cust = graft.Tables.customer(s, dir)
        .select($"c_custkey", ($"c_acctbal" * 100).cast("long").as("bal_cents"),
          $"c_nationkey".cast("long").as("c_nationkey"))
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        cust.filter($"c_custkey" % 3 === 0), tmp)
      s.sql("DROP TABLE IF EXISTS pj_q159_t")
      s.sql(s"CREATE TABLE pj_q159_t USING pjparquet OPTIONS (path '$tmp')")
      cust.filter($"c_custkey" % 2 === 0)
        .withColumn("bal_cents", $"bal_cents" + 100000L)
        .createOrReplaceTempView("pj_q159_src")
      s.sql("""MERGE INTO pj_q159_t AS t USING pj_q159_src AS s ON t.c_custkey = s.c_custkey
              |WHEN MATCHED THEN UPDATE SET bal_cents = s.bal_cents
              |WHEN NOT MATCHED THEN INSERT (c_custkey, bal_cents, c_nationkey)
              |  VALUES (s.c_custkey, s.bal_cents, s.c_nationkey)
              |WHEN NOT MATCHED BY SOURCE AND c_nationkey < 10 THEN DELETE
              |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal_cents = 0
              |""".stripMargin)
      s.sql("""SELECT c_nationkey, count(*) AS n_cust,
              |       CAST(sum(bal_cents) AS BIGINT) AS bal_sum
              |FROM pj_q159_t GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),
    "q176_wap_refs" -> ((s, dir) => {
      import s.implicits._
      // Branch/tag refs (round 18, PjRefs): write-audit-publish. A tag
      // pins the pre-churn snapshot (bit-exact time travel by name,
      // surviving expiry); a branch stages an append invisible to main
      // readers, the audit read overlays it, and fast_forward publishes
      // it as a validated commit. DuckDB recomputes the published
      // end-state from nation; the staging/audit/pin facts ride as bits.
      // Fresh table per run (refs are single-use: fast_forward consumes
      // the branch) — the timed operator IS the WAP cycle.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q176_wap")
      java.nio.file.Files.delete(tmp)
      val t = tmp.toString
      s.conf.set("spark.sql.catalog.pj_q176", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q176.`$t` (k BIGINT, name STRING, rk BIGINT) " +
        "USING pjparquet")
      val nation = graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"),
          $"n_regionkey".cast("long").as("rk"))
      nation.filter($"k" < 20).writeTo(s"pj_q176.`$t`").append() // v2
      s.sql(s"CALL pj_q176.system.tag(table => '$t', name => 'baseline')")
      // stage the remaining rows on a branch: invisible until published
      nation.filter($"k" >= 20)
        .write.format("pjparquet").mode("append").option("branch", "wip").save(t)
      val mainBefore = s.read.format("pjparquet").load(t).count()
      val auditRows = s.read.format("pjparquet").option("branch", "wip").load(t).count()
      s.sql(s"CALL pj_q176.system.fast_forward(table => '$t', branch => 'wip')")
      graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
      graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
      val tagRows = s.read.format("pjparquet").option("tag", "baseline").load(t).count()
      s.read.format("pjparquet").load(t)
        .agg(count(lit(1)).as("n_rows"),
          sum($"k").cast("long").as("k_sum"),
          sum($"rk").cast("long").as("rk_sum"))
        .withColumn("staged_invisible", lit(if (mainBefore == 20L) 1L else 0L))
        .withColumn("audit_sees_staged", lit(if (auditRows == 25L) 1L else 0L))
        .withColumn("tag_pins_baseline", lit(if (tagRows == 20L) 1L else 0L))
    }),
    "q175_iceberg_metadata_export" -> ((s, dir) => {
      import s.implicits._
      // Iceberg-metadata export (round 18, UniForm-style): the head
      // snapshot materializes as Iceberg v2 metadata.json + avro manifest
      // list + manifest. The engine-checked bits validate the export
      // against the commit log: exact data-file set, schema field ids,
      // identity partition spec, and snapshot id; row values are nation
      // arithmetic DuckDB recomputes.
      val t = fixtureDir("pj_q175_ice", dir) { d =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(d))
        s.conf.set("spark.sql.catalog.pj_q175", "graft.sources.pjparquet.PjCatalog")
        s.sql(s"CREATE TABLE pj_q175.`$d` (k BIGINT, name STRING, rk BIGINT) " +
          "USING pjparquet PARTITIONED BY (rk)")
        graft.Tables.nation(s, dir)
          .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"),
            $"n_regionkey".cast("long").as("rk"))
          .writeTo(s"pj_q175.`$d`").append()
      }
      val rep = graft.sources.pjparquet.PjIcebergMetadata.generate(s, t)
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sessionState.newHadoopConf())
      val snap = graft.sources.pjparquet.PjCommitLog
        .latest(fs, new org.apache.hadoop.fs.Path(t)).get
      val md = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          t, "metadata", s"v${snap.version}.metadata.json")))
      val snapIdOk = md.get("current-snapshot-id").asLong == snap.version &&
        rep.snapshotId == snap.version
      val idsOk = {
        import scala.jdk.CollectionConverters._
        md.get("schemas").get(0).get("fields").elements().asScala.toSeq
          .map(f => f.get("name").asText -> f.get("id").asLong) ==
          Seq("k" -> 1L, "name" -> 2L, "rk" -> 3L)
      }
      val specOk = {
        val f = md.get("partition-specs").get(0).get("fields").get(0)
        f.get("name").asText == "rk" && f.get("transform").asText == "identity" &&
          f.get("source-id").asLong == 3L
      }
      val filesOk = {
        import scala.jdk.CollectionConverters._
        import org.apache.avro.file.DataFileReader
        import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
        val listPath = md.get("snapshots").get(0).get("manifest-list").asText
          .stripPrefix("file:")
        val lr = new DataFileReader[GenericRecord](
          new java.io.File(listPath), new GenericDatumReader[GenericRecord]())
        val manifestPath =
          try lr.iterator().asScala.toList.head.get("manifest_path").toString
            .stripPrefix("file:")
          finally lr.close()
        val mr = new DataFileReader[GenericRecord](
          new java.io.File(manifestPath), new GenericDatumReader[GenericRecord]())
        val got =
          try mr.iterator().asScala.toList.map(_.get("data_file")
            .asInstanceOf[GenericRecord].get("file_path").toString).toSet
          finally mr.close()
        val rootUri = fs.makeQualified(new org.apache.hadoop.fs.Path(t)).toString
        got == snap.entries.map(e => s"$rootUri/${e.path}").toSet
      }
      s.table(s"pj_q175.`$t`")
        .agg(count(lit(1)).as("n_rows"),
          sum($"k").cast("long").as("k_sum"),
          sum($"rk").cast("long").as("rk_sum"))
        .withColumn("snapshot_id_ok", lit(if (snapIdOk) 1L else 0L))
        .withColumn("schema_ids_ok", lit(if (idsOk) 1L else 0L))
        .withColumn("partition_spec_ok", lit(if (specOk) 1L else 0L))
        .withColumn("file_list_ok", lit(if (filesOk) 1L else 0L))
    }),
    "q174_nested_stats_skipping" -> ((s, dir) => {
      import s.implicits._
      // Nested-leaf data skipping (round 18): chunk-stats and commit-log
      // stats envelopes cover DOTTED leaf paths under top-level structs
      // ("payload.score" — each leaf's min/max/null_count from its own
      // ColumnChunk, keyed by path_in_schema), so a filter on a struct
      // leaf plans a strict subset of files in BOTH lanes: the index-only
      // directory (per-rg chunk stats through the PJ_3 leaf walk) and the
      // logged table (whole-file envelopes, zero sidecar reads). Values
      // are plain arithmetic DuckDB recomputes from orders; the
      // plan-shape facts ride as engine-checked bits. Aggregate pushdown
      // on a nested leaf is REFUSED (falls back to a real scan) but still
      // answers exactly — the min rides in the oracled output.
      def nested = graft.Tables.orders(s, dir)
        .select($"o_orderkey",
          struct(($"o_orderkey" % 1000L).as("score"),
            $"o_orderstatus".as("status"),
            $"o_custkey".cast("long").as("cust")).as("payload"))
        .repartitionByRange(8, $"o_orderkey" % 1000L)
      val unlogged = fixtureDir("pj_q174_idx", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(nested, d)
      }
      val logged = fixtureDir("pj_q174_log", dir) { d =>
        nested.write.format("pjparquet").mode("append")
          .option("log.enabled", "true").save(d)
      }
      def tasks(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            b.inputRDD.getNumPartitions
        }.sum
      def load(d: String) = s.read.format("pjparquet").load(d)
      val idxFull = tasks(load(unlogged).filter($"payload.score" >= 0L))
      val idxPruned = tasks(load(unlogged).filter($"payload.score" >= 900L))
      val envFull = tasks(load(logged).filter($"payload.score" >= 0L))
      val envPruned = tasks(load(logged).filter($"payload.score" >= 900L))
      val aggPlan = load(logged).agg(min($"payload.score"))
        .queryExecution.executedPlan.toString
      load(logged).filter($"payload.score" >= 900L)
        .groupBy($"payload.status".as("status"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"payload.cust").cast("long").as("cust_sum"),
          min($"payload.score").cast("long").as("min_score"))
        .withColumn("idx_lane_pruned",
          lit(if (idxPruned > 0 && idxPruned < idxFull) 1L else 0L))
        .withColumn("envelope_lane_pruned",
          lit(if (envPruned > 0 && envPruned < envFull) 1L else 0L))
        .withColumn("nested_agg_not_pushed",
          lit(if (aggPlan.contains("BatchScan") &&
            !aggPlan.contains("LocalTableScan")) 1L else 0L))
        .orderBy($"status")
    }),
    "q173_cbo_histograms" -> ((s, dir) => {
      import s.implicits._
      // CBO equi-height histograms (round 17, PjAnalyze + columnStats):
      // min/max-only selectivity assumes a UNIFORM distribution, so a
      // predicate over the quiet range of a SKEWED column estimates ~half
      // the table and the CBO refuses a broadcast that actually fits.
      // With histograms recorded, the same filter estimate collapses to
      // the real mass and the join plan FLIPS to a broadcast of the
      // filtered side. Values are plain join arithmetic DuckDB
      // recomputes; the flip bits are engine-checked literals.
      // fixture tables (built once per JVM — the measured operator is the
      // ANALYZE/estimate/plan sequence below, not the write)
      val aDir = fixtureDir("pj_q173_a", dir) { d =>
        graft.Tables.orders(s, dir).select(
          $"o_custkey".cast("long").as("custkey"),
          // skew: ~99% zeros, ~1% spread over (500, 1000]
          when($"o_orderkey" % 100 === 0, $"o_orderkey" % 500 + 501L)
            .otherwise(0L).as("sk"),
          $"o_orderkey".cast("long").as("okey"))
          .coalesce(2).write.format("pjparquet").mode("append")
          .option("log.enabled", "true").save(d)
      }
      val bDir = fixtureDir("pj_q173_b", dir) { d =>
        graft.Tables.customer(s, dir).select(
          $"c_custkey".cast("long").as("custkey"),
          $"c_nationkey".cast("long").as("nationkey"),
          $"c_name", $"c_mktsegment", $"c_acctbal")
          .coalesce(2).write.format("pjparquet").mode("append")
          .option("log.enabled", "true").save(d)
        s.conf.set("spark.sql.catalog.pj_q173", "graft.sources.pjparquet.PjCatalog")
        s.sql(s"CALL pj_q173.system.analyze(table => '$d')")
      }
      def filteredSize(sess: org.apache.spark.sql.SparkSession): BigInt = {
        val prev = org.apache.spark.sql.SparkSession.getActiveSession
        org.apache.spark.sql.SparkSession.setActiveSession(sess)
        try sess.read.format("pjparquet").load(aDir).filter(col("sk") > 500L)
          .queryExecution.optimizedPlan.stats.sizeInBytes
        finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      }
      def isoSession(threshold: BigInt): org.apache.spark.sql.SparkSession = {
        val iso = s.newSession()
        iso.conf.set("spark.sql.cbo.enabled", "true")
        iso.conf.set("spark.sql.adaptive.enabled", "false")
        iso.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
        iso
      }
      def joinPlan(sess: org.apache.spark.sql.SparkSession): String = {
        val prev = org.apache.spark.sql.SparkSession.getActiveSession
        org.apache.spark.sql.SparkSession.setActiveSession(sess)
        try sess.read.format("pjparquet").load(aDir).filter(col("sk") > 500L)
          .join(sess.read.format("pjparquet").load(bDir), "custkey")
          .groupBy(col("nationkey"))
          .agg(count(lit(1)).as("n_orders"), sum(col("okey")).as("key_sum"))
          .queryExecution.executedPlan.toString
        finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
      }
      // 1) ANALYZE with histograms: the estimate sees the real mass; the
      // broadcast threshold derives from IT (4x), so the same join
      // broadcasts the filtered side iff the histogram is recorded — at
      // every SF (the collapse bit below proves uniform > 5x hist)
      val histSess = s.newSession()
      histSess.conf.set("spark.sql.statistics.histogram.enabled", "true")
      s.conf.set("spark.sql.catalog.pj_q173", "graft.sources.pjparquet.PjCatalog")
      graft.sources.pjparquet.PjAnalyze.analyze(histSess, aDir)
      val sizeHist = filteredSize(isoSession(10L * 1024 * 1024))
      val threshold = sizeHist * 4
      val planHist = joinPlan(isoSession(threshold))
      // 2) re-ANALYZE plain: uniform min/max selectivity over [0, 1000]
      s.sql(s"CALL pj_q173.system.analyze(table => '$aDir')")
      val sizeUniform = filteredSize(isoSession(10L * 1024 * 1024))
      val planUniform = joinPlan(isoSession(threshold))
      // the CHOICE flips: with histograms the filtered-skew side is the
      // provably-small one and becomes the broadcast build side
      // (BuildLeft); under the uniform assumption it looks ~50x bigger,
      // so the CBO refuses to broadcast it (sort-merge, or a broadcast of
      // the other side when the threshold admits it)
      val flipped = planHist.contains("BroadcastHashJoin") &&
        planHist.contains("BuildLeft") &&
        !(planUniform.contains("BroadcastHashJoin") &&
          planUniform.contains("BuildLeft"))
      s.read.format("pjparquet").load(aDir).filter($"sk" > 500L)
        .join(s.read.format("pjparquet").load(bDir), "custkey")
        .groupBy($"nationkey")
        .agg(count(lit(1)).as("n_orders"), sum($"okey").cast("long").as("key_sum"))
        .withColumn("estimate_collapsed",
          lit(if (sizeHist * 5 < sizeUniform) 1L else 0L))
        .withColumn("broadcast_flipped", lit(if (flipped) 1L else 0L))
        .orderBy($"nationkey")
    }),
    "q172_column_mapping_id" -> ((s, dir) => {
      import s.implicits._
      // Column-mapping id mode (round 17): field ids assigned at CREATE
      // are stamped into every written parquet file and reads resolve
      // columns BY ID — a rename on our side (RENAME COLUMN) and a
      // "foreign" file whose names differ but whose ids match both keep
      // reads exact. DuckDB recomputes the row facts from nation; the
      // id-machinery facts ride as engine-checked bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q172_idmode")
      java.nio.file.Files.delete(tmp)
      val t = tmp.toString
      s.conf.set("spark.sql.catalog.pj_q172", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q172.`$t` (k BIGINT, name STRING, rk BIGINT) " +
        "USING pjparquet TBLPROPERTIES ('pj.columnMapping.mode'='id')")
      val nation = graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"),
          $"n_regionkey".cast("long").as("rk"))
      nation.filter($"k" < 10).coalesce(1).writeTo(s"pj_q172.`$t`").append()
      s.sql(s"ALTER TABLE pj_q172.`$t` RENAME COLUMN rk TO region")
      nation.filter($"k" >= 10)
        .select($"k", $"name", $"rk".as("region"))
        .coalesce(1).writeTo(s"pj_q172.`$t`").append()
      // the physical files carry the assigned field ids (1, 2, 3)
      val idsOk = {
        import scala.jdk.CollectionConverters._
        val f = new java.io.File(t).listFiles()
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .head
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath),
          s.sessionState.newHadoopConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getFileMetaData.getSchema.getFields.asScala
          .flatMap(x => Option(x.getId).map(_.intValue())).toSet == Set(1, 2, 3)
        finally r.close()
      }
      // a FOREIGN id-keyed file: different column names, same ids — the
      // id pairing (not the names) must serve its bytes
      val stage = java.nio.file.Files.createTempDirectory("pj_q172_stage")
      java.nio.file.Files.delete(stage)
      val foreign = s.range(100, 103).select(
        $"id".as("ident", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 1L).build()),
        concat(lit("F"), $"id").as("label", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 2L).build()),
        ($"id" % 5L).as("reg", new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", 3L).build()))
      s.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
      foreign.coalesce(1).write.parquet(stage.toString)
      val fs = new org.apache.hadoop.fs.Path(t)
        .getFileSystem(s.sessionState.newHadoopConf())
      val srcF = new java.io.File(stage.toString).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).head
      val relName = "part-foreign-q172.parquet"
      fs.rename(new org.apache.hadoop.fs.Path(srcF.getAbsolutePath),
        new org.apache.hadoop.fs.Path(t, relName))
      val facts = graft.sources.pjparquet.PjIndexJob.generateForPaths(
        s, Seq(s"$t/$relName"))
      graft.sources.pjparquet.PjCommitLog.commit(fs, new org.apache.hadoop.fs.Path(t),
        "append", facts.map(_.toEntry(relName)), Set.empty)
      graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
      graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
      s.table(s"pj_q172.`$t`")
        .agg(count(lit(1)).as("n_rows"),
          sum($"k").cast("long").as("k_sum"),
          sum($"region").cast("long").as("region_sum"),
          count(when($"k" >= 100L, 1)).cast("long").as("foreign_rows"))
        .withColumn("file_ids_stamped", lit(if (idsOk) 1L else 0L))
    }),
    "q171_named_catalog" -> ((s, dir) => {
      import s.implicits._
      // Metastore-named tables (round 17): a warehouse-configured catalog
      // maps cat.db.tbl onto <warehouse>/db/tbl by convention — the
      // directory tree IS the catalog (no metastore service, the
      // data-lake deployment shape). Create prod.nations from the nation
      // table, UPDATE/DELETE it by name, RENAME it, read it back by the
      // NEW name with SHOW TABLES / time-travel facts pinned; DuckDB
      // recomputes the surviving rows. Path addressing keeps working on
      // the same catalog (checked against the renamed table's dir).
      // Spark caches catalog instances per session, so the warehouse is
      // fixed at the catalog's FIRST initialization — reuse it on re-runs
      // (Bench runs every query several times) and rebuild the table
      val wh = s.conf.getOption("spark.sql.catalog.pj_q171.warehouse").getOrElse {
        val d = java.nio.file.Files.createTempDirectory("pj_q171_wh").toString
        s.conf.set("spark.sql.catalog.pj_q171", "graft.sources.pjparquet.PjCatalog")
        s.conf.set("spark.sql.catalog.pj_q171.warehouse", d)
        d
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS pj_q171.prod")
      s.sql("DROP TABLE IF EXISTS pj_q171.prod.nations")
      s.sql("DROP TABLE IF EXISTS pj_q171.prod.nations_v2")
      s.sql("CREATE TABLE pj_q171.prod.nations " +
        "(k BIGINT, name STRING, rk BIGINT) USING pjparquet")
      graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name".as("name"),
          $"n_regionkey".cast("long").as("rk"))
        .writeTo("pj_q171.prod.nations").append()
      s.sql("UPDATE pj_q171.prod.nations SET rk = rk + 10 WHERE k % 2 = 0")
      s.sql("DELETE FROM pj_q171.prod.nations WHERE k >= 20")
      s.sql("ALTER TABLE pj_q171.prod.nations RENAME TO prod.nations_v2")
      val listed = s.sql("SHOW TABLES IN pj_q171.prod").collect()
        .map(_.getString(1)).toSeq
      val oldGone = !s.catalog.tableExists("pj_q171.prod.nations")
      // v1 CREATE (empty), v2 the append — time travel by NAME sees the
      // pre-DML row count through the rename (same commit log)
      val v2Rows = s.sql(
        "SELECT count(*) FROM pj_q171.prod.nations_v2 VERSION AS OF 2")
        .head().getLong(0)
      val pathRows = s.table(s"pj_q171.`$wh/prod/nations_v2`").count()
      s.table("pj_q171.prod.nations_v2")
        .agg(count(lit(1)).as("n_rows"),
          sum($"k").cast("long").as("k_sum"),
          sum($"rk").cast("long").as("rk_sum"))
        .withColumn("renamed_listed",
          lit(if (listed == Seq("nations_v2") && oldGone) 1L else 0L))
        .withColumn("time_travel_by_name", lit(if (v2Rows == 25L) 1L else 0L))
        .withColumn("path_addressing_intact", lit(if (pathRows == 20L) 1L else 0L))
    }),
    "q170_bucket_transform_spj" -> ((s, dir) => {
      import s.implicits._
      // Declared bucket(n, col) partition transforms (Iceberg parity):
      // both tables route rows into <col>_bucket=<id>/ directories via
      // id = pmod(hash(col), n), the scans report
      // KeyGroupedPartitioning(bucket(n, col)) through the catalog's
      // FunctionCatalog-served bucket function, and the join on the
      // bucket column plans with ZERO exchange under SPJ — the
      // shuffle-free fact-fact join on a high-cardinality key that
      // identity partitioning can't hold (one dir per key). Values are
      // DuckDB's plain join either way; the plan-shape bit pins the
      // no-exchange fact from an isolated session carrying the SPJ confs.
      val ordDir = fixtureDir("pj_q170_orders", dir) { d =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(d))
        s.conf.set("spark.sql.catalog.pj_q170", "graft.sources.pjparquet.PjCatalog")
        s.sql(s"CREATE TABLE pj_q170.`$d` (o_orderkey BIGINT, o_custkey BIGINT) " +
          "USING pjparquet PARTITIONED BY (bucket(8, o_custkey))")
        graft.Tables.orders(s, dir)
          .select($"o_orderkey".cast("long").as("o_orderkey"),
            $"o_custkey".cast("long").as("o_custkey"))
          .writeTo(s"pj_q170.`$d`").append()
      }
      val custDir = fixtureDir("pj_q170_customer", dir) { d =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(d))
        s.conf.set("spark.sql.catalog.pj_q170", "graft.sources.pjparquet.PjCatalog")
        s.sql(s"CREATE TABLE pj_q170.`$d` (c_custkey BIGINT, c_nationkey BIGINT) " +
          "USING pjparquet PARTITIONED BY (bucket(8, c_custkey))")
        graft.Tables.customer(s, dir)
          .select($"c_custkey".cast("long").as("c_custkey"),
            $"c_nationkey".cast("long").as("c_nationkey"))
          .writeTo(s"pj_q170.`$d`").append()
      }
      def joined(sess: org.apache.spark.sql.SparkSession) = {
        sess.conf.set("spark.sql.catalog.pj_q170", "graft.sources.pjparquet.PjCatalog")
        sess.table(s"pj_q170.`$ordDir`")
          .join(sess.table(s"pj_q170.`$custDir`"),
            $"o_custkey" === $"c_custkey")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_orders"), sum($"o_orderkey").as("key_sum"))
          .orderBy($"c_nationkey")
      }
      val iso = s.newSession()
      iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joinShuffleFree = {
        val plan = joined(iso).queryExecution.executedPlan.toString
        // the aggregation after the join may still shuffle on nationkey;
        // the JOIN itself must not — no exchange keyed on the join key
        !plan.contains("Exchange hashpartitioning(o_custkey") &&
          !plan.contains("Exchange hashpartitioning(c_custkey")
      }
      joined(s)
        .withColumn("spj_join_no_shuffle", lit(if (joinShuffleFree) 1L else 0L))
    }),
    "q169_idempotent_txn" -> ((s, dir) => {
      import s.implicits._
      // Idempotent writer commits (txnAppId/txnVersion, Delta's
      // SetTransaction): each batch declares an application transaction
      // identity; a REPLAYED batch — the retried foreachBatch / restarted
      // job case — is a metadata-rate no-op. Two batches land, three
      // replays (same version, twice; an older version, once) change
      // nothing. DuckDB recomputes the exactly-once content from the
      // source relation; engine-checked literals pin the no-op facts.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q169_txn")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      val orders = graft.Tables.orders(s, dir)
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"))
      def writeBatch(rem: Int, ver: Long): Unit =
        orders.filter($"o_orderkey" % 3 === rem)
          .write.format("pjparquet").mode("append")
          .option("log.enabled", "true")
          .option("txnAppId", "q169-loader").option("txnVersion", ver.toString)
          .save(tmp)
      writeBatch(0, 1L)
      val root = new org.apache.hadoop.fs.Path(tmp)
      val fs = root.getFileSystem(s.sessionState.newHadoopConf())
      val vAfter1 = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.version
      writeBatch(0, 1L) // replay of batch 1
      writeBatch(1, 2L) // batch 2
      writeBatch(1, 2L) // replay of batch 2
      writeBatch(0, 1L) // late replay of the OLDER batch
      val head = graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
      val replaysNoOp = head.version == vAfter1 + 1 &&
        head.txnVersion("q169-loader").contains(2L)
      // every parquet file on disk is live in the snapshot — replays left
      // no orphaned staged files behind
      val onDisk = Option(new java.io.File(tmp).listFiles()).toSeq.flatten
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      val noOrphans = onDisk == head.files.size
      s.read.format("pjparquet").load(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum($"o_custkey").as("cust_sum"))
        .withColumn("replays_noop", lit(if (replaysNoOp) 1L else 0L))
        .withColumn("no_orphans", lit(if (noOrphans) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q168_cross_partition_merge" -> ((s, dir) => {
      import s.implicits._
      // Merge-on-read MERGE on a HIVE-PARTITIONED table whose UPDATE
      // clause MOVES rows across partition directories (SET on the
      // partition column): the delta writer decomposes each move into a
      // position delete in the old directory plus an id-carrying insert
      // routed to the new one, so the layout stays partition-pure.
      // DuckDB recomputes the full post-MERGE state relationally — a
      // hash-exact oracle over update-move + delete + insert at once.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q168_xpm")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      s.conf.set("spark.sql.catalog.pj_q168", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q168.`$tmp` (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING) USING pjparquet PARTITIONED BY (o_orderstatus)")
      val orders = graft.Tables.orders(s, dir)
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"))
      orders.filter($"o_orderkey" % 5 === 0).writeTo(s"pj_q168.`$tmp`").append()
      orders
        .filter($"o_orderkey" % 10 === 0 ||
          ($"o_orderkey" % 5 === 1 && $"o_orderkey" % 3 === 0))
        .select($"o_orderkey", ($"o_custkey" + 1000000L).as("o_custkey"),
          lit("X").as("o_orderstatus"))
        .createOrReplaceTempView("pj_q168_src")
      s.sql(
        s"""MERGE INTO pj_q168.`$tmp` t USING pj_q168_src s ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND t.o_orderkey % 20 = 0 THEN
           |  UPDATE SET o_orderstatus = s.o_orderstatus, o_custkey = s.o_custkey
           |WHEN MATCHED THEN DELETE
           |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, o_orderstatus)
           |  VALUES (s.o_orderkey, s.o_custkey, s.o_orderstatus)
           |""".stripMargin)
      val files = {
        val root = new org.apache.hadoop.fs.Path(tmp)
        val fs = root.getFileSystem(s.sessionState.newHadoopConf())
        graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.files
      }
      val movedLanded = files.exists(_.startsWith("o_orderstatus=X/"))
      s.table(s"pj_q168.`$tmp`")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_rows"), sum($"o_custkey").as("cust_sum"))
        .withColumn("moved_rows_landed", lit(if (movedLanded) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q167_atomic_ctas_rtas" -> ((s, dir) => {
      import s.implicits._
      // Atomic CTAS + RTAS (StagingTableCatalog): CREATE TABLE AS SELECT
      // materializes at a hidden sibling path and publishes by ONE
      // directory rename; REPLACE TABLE AS SELECT flips the commit-log
      // table with ONE exclusive commit — new schema visible atomically,
      // the previous generation still time-travelable. DuckDB recomputes
      // the final (replaced) content from the source relation; literals
      // pin the atomicity facts.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q167_ctas")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      s.conf.set("spark.sql.catalog.pj_q167", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"DROP TABLE IF EXISTS pj_q167_src")
      graft.Tables.orders(s, dir)
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"))
        .createOrReplaceTempView("pj_q167_src")
      s.sql(s"CREATE TABLE pj_q167.`$tmp` USING pjparquet AS " +
        "SELECT o_orderkey, o_custkey FROM pj_q167_src WHERE o_orderkey % 4 = 0")
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val v1 = graft.sources.pjparquet.PjCommitLog.latest(
        fs, new org.apache.hadoop.fs.Path(tmp)).get
      val ctasCount = s.table(s"pj_q167.`$tmp`").count()
      s.sql(s"REPLACE TABLE pj_q167.`$tmp` USING pjparquet AS " +
        "SELECT o_orderstatus, count(*) AS n_orders, sum(o_custkey) AS cust_sum " +
        "FROM pj_q167_src GROUP BY o_orderstatus")
      val v2 = graft.sources.pjparquet.PjCommitLog.latest(
        fs, new org.apache.hadoop.fs.Path(tmp)).get
      val oldGen = s.read.format("pjparquet")
        .option("versionAsOf", v1.version.toString).load(tmp)
      val atomicCtas = v1.version == 2L && v1.entries.forall(_.planned) &&
        ctasCount == oldGen.count()
      val atomicFlip = v2.version == v1.version + 1 &&
        oldGen.columns.toSeq == Seq("o_orderkey", "o_custkey")
      s.table(s"pj_q167.`$tmp`")
        .withColumn("atomic_ctas", lit(if (atomicCtas) 1L else 0L))
        .withColumn("atomic_flip", lit(if (atomicFlip) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q166_hilbert_optimize" -> ((s, dir) => {
      import s.implicits._
      // OPTIMIZE ... curve => 'hilbert' (PjCompaction.optimize +
      // graft.functions.HilbertCurve): the Skilling-curve re-clustering
      // lane — unit-step locality, Delta's default clustering curve. The
      // oracle recomputes a two-dimensional band's content from the
      // source relation (losslessness through the rewrite); the
      // engine-checked literals pin the lifecycle: the first optimize
      // rewrote, per-file provenance records the hilbert spec, the
      // same-spec rerun skipped everything, and the clustered layout
      // prunes the band at planning time.
      val tmp = fixtureDir("pj_q166_hilbert", dir) { d =>
        // CREATE resolves the identifier first: an existing (empty) dir is
        // "present but unreadable", not TableNotFound — remove it
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(d))
        s.conf.set("spark.sql.catalog.pj_q166", "graft.sources.pjparquet.PjCatalog")
        s.sql(s"CREATE TABLE pj_q166.`$d` (l_orderkey BIGINT, l_partkey BIGINT, " +
          "l_quantity DOUBLE) USING pjparquet")
        graft.Tables.lineitem(s, dir)
          .select($"l_orderkey".cast("long").as("l_orderkey"),
            $"l_partkey".cast("long").as("l_partkey"),
            $"l_quantity".cast("double").as("l_quantity"))
          .repartitionByRange(8, $"l_orderkey").sortWithinPartitions("l_orderkey")
          .writeTo(s"pj_q166.`$d`").append()
        // scale-independent: ~8 clustered files at any sf
        val totalBytes = Option(new java.io.File(d).listFiles()).toSeq.flatten
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(_.length).sum
        val target = math.max(totalBytes / 8, 16L * 1024)
        val r1 = graft.sources.pjparquet.PjCompaction.optimize(
          s, d, Seq("l_orderkey", "l_partkey"), target, curve = "hilbert")
        val r2 = graft.sources.pjparquet.PjCompaction.optimize(
          s, d, Seq("l_orderkey", "l_partkey"), target, curve = "hilbert")
        val fs = new org.apache.hadoop.fs.Path(d)
          .getFileSystem(s.sessionState.newHadoopConf())
        val entries = graft.sources.pjparquet.PjCommitLog.latest(
          fs, new org.apache.hadoop.fs.Path(d)).get.entries
        q166Facts.put(d, (
          r1.compactedInto > 0,
          r2.compactedInto == 0 && r2.smallFiles == 0,
          entries.nonEmpty && entries.forall(
            _.clusteredBy.exists(_.startsWith("hilbert:")))))
      }
      val (rewrote, rerunSkipped, provenance) = q166Facts.get(tmp)
      val b = pj(s, dir, "lineitem").agg(
        min($"l_partkey").cast("long"), max($"l_partkey").cast("long")).head()
      val (pMin, pMax) = (b.getLong(0), b.getLong(1))
      val (pLo, pHi) = (pMin + (pMax - pMin) / 4, pMin + (pMax - pMin) / 2)
      def plannedRgs(filtered: Boolean): Int = {
        val iso = s.newSession()
        iso.conf.set("spark.sql.adaptive.enabled", "false")
        val base = iso.read.format("pjparquet").load(tmp)
        val df = (if (filtered) base.filter(col("l_partkey") >= pLo && col("l_partkey") <= pHi)
                  else base).select(col("l_quantity"))
        df.queryExecution.executedPlan.collect {
          case bx: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bx
        }.flatMap(_.partitions.flatten).collect {
          case p: graft.sources.pjparquet.PjInputPartition => p.rowGroups.length
        }.sum
      }
      val prunes = plannedRgs(filtered = true) < plannedRgs(filtered = false)
      s.read.format("pjparquet").load(tmp)
        .filter($"l_partkey" >= pLo && $"l_partkey" <= pHi)
        .agg(count(lit(1)).as("n_rows"),
          round(sum($"l_quantity"), 2).as("qty_sum"),
          sum($"l_orderkey" * $"l_partkey").as("key_checksum"))
        .withColumn("rewrote_once", lit(if (rewrote) 1L else 0L))
        .withColumn("rerun_skipped", lit(if (rerunSkipped) 1L else 0L))
        .withColumn("hilbert_provenance", lit(if (provenance) 1L else 0L))
        .withColumn("band_prunes", lit(if (prunes) 1L else 0L))
    }),
    "q164_convert_in_place" -> ((s, dir) => {
      import s.implicits._
      // In-place CONVERT (PjConvert, Delta's CONVERT TO DELTA): a plain
      // Hive-partitioned parquet directory becomes a commit-log table
      // without rewriting a byte — distributed listing + index fleet, one
      // exclusive commit. The converted table is then a full citizen:
      // a DV DELETE lands on top and version 1 time-travels back to the
      // adopted snapshot. DuckDB recomputes the post-DELETE aggregate from
      // the source relation; the engine-checked literals pin the adoption
      // facts (v1, files adopted untouched, every entry plannable).
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q164_conv")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      val orders = graft.Tables.orders(s, dir)
        .filter($"o_orderkey" % 3 === 0)
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"))
      orders.repartition(2).write.partitionBy("o_orderstatus").parquet(tmp)
      val before = {
        val root = new org.apache.hadoop.fs.Path(tmp)
        val fs = root.getFileSystem(s.sessionState.newHadoopConf())
        fs.listFiles(root, true)
      }
      var sigBefore = Map.empty[String, (Long, Long)]
      while (before.hasNext) {
        val st = before.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          sigBefore += (st.getPath.toString -> (st.getLen, st.getModificationTime))
      }
      val r = graft.sources.pjparquet.PjConvert.convert(s, tmp)
      val after = {
        val root = new org.apache.hadoop.fs.Path(tmp)
        val fs = root.getFileSystem(s.sessionState.newHadoopConf())
        val it = fs.listFiles(root, true)
        var m = Map.empty[String, (Long, Long)]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet") &&
              !st.getPath.getName.startsWith("."))
            m += (st.getPath.toString -> (st.getLen, st.getModificationTime))
        }
        m
      }
      val snap = {
        val root = new org.apache.hadoop.fs.Path(tmp)
        val fs = root.getFileSystem(s.sessionState.newHadoopConf())
        graft.sources.pjparquet.PjCommitLog.latest(fs, root).get
      }
      val adopted = r.version == 1L && r.files > 0 && after == sigBefore &&
        snap.entries.forall(_.planned)
      s.conf.set("spark.sql.catalog.pj_q164", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"DELETE FROM pj_q164.`$tmp` WHERE o_orderkey % 2 = 0")
      val v1Count = s.read.format("pjparquet").option("versionAsOf", "1")
        .load(tmp).count()
      val timeTravelExact = v1Count == orders.count()
      s.read.format("pjparquet").load(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum($"o_custkey").as("cust_sum"))
        .withColumn("adopted_in_place", lit(if (adopted) 1L else 0L))
        .withColumn("v1_time_travel_exact", lit(if (timeTravelExact) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q165_optimized_write" -> ((s, dir) => {
      import s.implicits._
      // Optimized writes (pj.optimizeWrite.enabled, Delta parity): the
      // write declares a NON-strict clustered distribution + advisory
      // size, so Spark plans RebalancePartitions and AQE coalesces a
      // many-task upstream into one right-sized file per partition value
      // — no small-file storm — while files stay partition-pure. The
      // engine literal pins the file economics (3 partition values from
      // an 8-task upstream = exactly 3 files); DuckDB recomputes the data.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q165_ow")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      s.conf.set("spark.sql.catalog.pj_q165", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q165.`$tmp` (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING) USING pjparquet PARTITIONED BY (o_orderstatus) " +
        "TBLPROPERTIES ('pj.optimizeWrite.enabled'='true')")
      graft.Tables.orders(s, dir)
        .filter($"o_orderkey" % 3 === 1)
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_orderstatus".cast("string").as("o_orderstatus"))
        .repartition(8)
        .writeTo(s"pj_q165.`$tmp`").append()
      val files = {
        val root = new org.apache.hadoop.fs.Path(tmp)
        val fs = root.getFileSystem(s.sessionState.newHadoopConf())
        graft.sources.pjparquet.PjCommitLog.latest(fs, root).get.files
      }
      val statuses = s.table(s"pj_q165.`$tmp`").select($"o_orderstatus")
        .distinct().count()
      val coalesced = files.size.toLong == statuses
      s.table(s"pj_q165.`$tmp`")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"), sum($"o_orderkey").as("key_sum"))
        .withColumn("one_file_per_partition", lit(if (coalesced) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q161_copy_into" -> ((s, dir) => {
      import s.implicits._
      // Idempotent COPY INTO (round 14, PjCopyInto): a staging directory
      // of raw parquet drops ingests into a logged table exactly once —
      // the rerun is a metadata-rate no-op (atomic per-file claim
      // markers), and a late-arriving file picks up incrementally. The
      // oracle recomputes the final table from the full orders relation;
      // the engine-checked literals pin the idempotence facts.
      val srcDir = java.nio.file.Files.createTempDirectory("pj_q161_src").toString
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q161_tbl")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      val orders = graft.Tables.orders(s, dir).select(
        $"o_orderkey".cast("long").as("o_orderkey"),
        $"o_custkey".cast("long").as("o_custkey"),
        $"o_orderstatus".cast("string").as("o_orderstatus"))
      orders.filter($"o_orderkey" % 2 === 0).coalesce(2)
        .write.mode("overwrite").parquet(s"$srcDir/batch_even")
      s.conf.set("spark.sql.catalog.pj_q161", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q161.`$tmp` (o_orderkey BIGINT, o_custkey BIGINT, " +
        "o_orderstatus STRING) USING pjparquet")
      // the ingest verb runs through its SQL STATEMENT face (round 17):
      // COPY INTO t FROM src — pure sugar over PjCopyInto, same report
      val ext = sqlStatementSession(s)
      def copySql() = ext.sql(
        s"COPY INTO '$tmp' FROM '$srcDir' FILEFORMAT = PARQUET").collect().head
      val r1 = copySql()
      val r2 = copySql() // no-op
      orders.filter($"o_orderkey" % 2 === 1).coalesce(2)
        .write.mode("overwrite").parquet(s"$srcDir/batch_odd")
      val r3 = copySql()
      val rerunNoop = r2.getLong(0) == 0 && r2.getLong(3) == 0 &&
        r2.getLong(4) == r1.getLong(4)
      val incremental = r1.getLong(0) > 0 && r3.getLong(0) > 0 &&
        r3.getLong(1) == r1.getLong(0)
      s.read.format("pjparquet").load(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum($"o_orderkey").as("key_sum"))
        .withColumn("rerun_noop", lit(if (rerunNoop) 1L else 0L))
        .withColumn("incremental_pickup", lit(if (incremental) 1L else 0L))
        .orderBy($"o_orderstatus")
    }),
    "q154_partition_evolution" -> ((s, dir) => {
      import s.implicits._
      // Partition-spec evolution (round 13 — Iceberg-style, via SET
      // TBLPROPERTIES on pj.partition.columns): a lang-partitioned
      // documents table evolves to (lang, era) for FUTURE writes; the
      // old generation's rows read era as NULL, both generations prune,
      // and the guards refuse silent-NULL evolutions. DuckDB recomputes
      // the union (old rows with NULL era, new with era=1).
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q154_pevo")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      s.conf.set("spark.sql.catalog.pj_q154", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q154.`$tmp` (doc_id BIGINT, lang STRING, n_chars BIGINT) " +
        "USING pjparquet PARTITIONED BY (lang)")
      graft.Tables.documents(s, dir)
        .filter($"doc_id" % 2 === 0)
        .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars"))
        .write.format("pjparquet").mode("append").save(tmp) // old generation
      s.sql(s"ALTER TABLE pj_q154.`$tmp` ADD COLUMN era BIGINT")
      s.sql(s"ALTER TABLE pj_q154.`$tmp` SET TBLPROPERTIES " +
        "('pj.partition.columns' = 'lang:string,era:bigint')")
      graft.Tables.documents(s, dir)
        .filter($"doc_id" % 2 === 1)
        .select($"doc_id", $"lang", length($"text").cast("long").as("n_chars"),
          lit(1L).as("era"))
        .write.format("pjparquet").mode("append").save(tmp) // new generation
      // guard bit: adding a column live files store as DATA must refuse
      val guardRefused =
        try {
          s.sql(s"ALTER TABLE pj_q154.`$tmp` SET TBLPROPERTIES " +
            "('pj.partition.columns' = 'lang:string,era:bigint,n_chars:bigint')")
          false
        } catch { case e: Exception =>
          Option(e.getMessage).exists(_.contains("DATA")) }
      val t = s.read.format("pjparquet").load(tmp)
      def planned(df: org.apache.spark.sql.DataFrame): Int =
        "pjparquet (\\d+) file\\(s\\)".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1).toInt).getOrElse(-1)
      // a predicate on the NEW key prunes the whole old generation
      val total = planned(t.filter($"doc_id" >= 0L))
      val newOnly = planned(t.filter($"era" === 1L))
      t.groupBy($"lang", $"era")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars_sum"),
          sum($"doc_id").as("id_sum"))
        .withColumn("guard_refused", lit(if (guardRefused) 1L else 0L))
        .withColumn("new_key_pruned_old_gen",
          lit(if (newOnly > 0 && total > newOnly) 1L else 0L))
        .orderBy($"lang", $"era")
    }),
    "q152_protocol_features" -> ((s, dir) => {
      import s.implicits._
      // Table-features protocol (round 13, PjProtocol — the format's
      // feature-flag guard): a plain table records NO protocol; the first
      // DV delete upgrades the lane to require `dv` (reader+writer);
      // `detail` exposes it; and a hand-planted commit requiring a FUTURE
      // feature makes reads fail with a clear upgrade message instead of
      // silently resurrecting deleted rows. DuckDB recomputes the
      // surviving row facts; the protocol facts are engine-checked bits.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q152_proto").toString
      graft.Tables.nation(s, dir)
        .select($"n_nationkey".cast("long").as("k"), $"n_name", $"n_regionkey")
        .coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1: no protocol
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sessionState.newHadoopConf())
      val root = new org.apache.hadoop.fs.Path(tmp)
      val preProtocol = graft.sources.pjparquet.PjCommitLog
        .latest(fs, root).get.protocolJson
      s.conf.set("spark.sql.catalog.pj_q152", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"DROP TABLE IF EXISTS pj_q152_t")
      s.sql(s"CREATE TABLE pj_q152_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q152_t WHERE k % 5 = 0") // v2: dv => protocol upgrade
      val d = s.sql(s"CALL pj_q152.system.detail('$tmp')").collect().head
      val protoJson = Option(d.getString(d.length - 1)).getOrElse("")
      val proto = graft.sources.pjparquet.PjProtocol.parse(
        Option(protoJson).filter(_.nonEmpty))
      // future-feature guard: plant an upgrade commit a future build wrote
      val v = graft.sources.pjparquet.PjCommitLog.versions(fs, root).last + 1
      val body = s"""{"version":$v,"ts":${System.currentTimeMillis()},""" +
        """"action":"upgrade","nFiles":1,""" +
        """"protocol":"{\"readerFeatures\":[\"future-r9\"],\"writerFeatures\":[\"future-r9\"]}",""" +
        """"add":[],"remove":[]}"""
      val p = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, "_pj_log"), f"$v%020d.json")
      val out = fs.create(p, false)
      out.write(body.getBytes("UTF-8")); out.close()
      graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
      graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
      val readRefused =
        try { s.read.format("pjparquet").load(tmp).count(); false }
        catch { case e: Exception =>
          Option(e.getMessage).exists(m =>
            m.contains("future-r9") && m.contains("reader table feature")) }
      val writeRefused =
        try {
          graft.Tables.nation(s, dir).limit(1)
            .select($"n_nationkey".cast("long").as("k"), $"n_name", $"n_regionkey")
            .write.format("pjparquet").mode("append")
            .option("log.enabled", "true").save(tmp)
          false
        } catch { case e: Exception =>
          Option(e.getMessage).exists(_.contains("future-r9")) }
      // roll the planted commit back so the row-fact read below works
      fs.delete(p, false)
      graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
      graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
      s.sql(s"DROP TABLE IF EXISTS pj_q152_t")
      s.read.format("pjparquet").load(tmp)
        .groupBy($"n_regionkey")
        .agg(count(lit(1)).as("n_nations"), sum($"k").as("key_sum"))
        .withColumn("fresh_table_no_protocol", lit(if (preProtocol.isEmpty) 1L else 0L))
        .withColumn("dv_requires_reader_dv",
          lit(if (proto.reader.contains("dv") && proto.writer.contains("dv")) 1L else 0L))
        .withColumn("future_feature_read_refused", lit(if (readRefused) 1L else 0L))
        .withColumn("future_feature_write_refused", lit(if (writeRefused) 1L else 0L))
        .orderBy($"n_regionkey")
    }),
    "q153_generated_partition_pruning" -> ((s, dir) => {
      import s.implicits._
      // Generated-column partition pruning (round 13, PjGeneratedPruning):
      // a table PARTITIONED BY a GENERATED DATE column (g = CAST(ts AS
      // DATE)) prunes day directories from a predicate on the BASE
      // timestamp alone — the first query every analyst runs on a
      // day-partitioned fact table. Plan-shape bit: the filtered scan
      // plans strictly fewer files than the full scan. DuckDB recomputes
      // the per-day aggregate under the same timestamp range.
      val tmpDir = java.nio.file.Files.createTempDirectory("pj_q153_genprune")
      java.nio.file.Files.delete(tmpDir)
      val tmp = tmpDir.toString
      s.conf.set("spark.sql.catalog.pj_q153", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CREATE TABLE pj_q153.`$tmp` (ts TIMESTAMP_NTZ, k BIGINT, cents BIGINT, " +
        "g DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) USING pjparquet " +
        "PARTITIONED BY (g)")
      graft.Tables.orders(s, dir)
        .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
          $"o_orderdate" < lit("1995-01-15").cast("timestamp_ntz"))
        .select($"o_orderdate".as("ts"), $"o_orderkey".as("k"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .write.format("pjparquet").mode("append").save(tmp)
      val t = s.read.format("pjparquet").load(tmp)
      def planned(df: org.apache.spark.sql.DataFrame): Int =
        "pjparquet (\\d+) file\\(s\\)".r
          .findFirstMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1).toInt).getOrElse(-1)
      val lo = lit("1995-01-04 00:00:00").cast("timestamp_ntz")
      val hi = lit("1995-01-07 00:00:00").cast("timestamp_ntz")
      val q = t.filter($"ts" >= lo && $"ts" < hi)
      val total = planned(t.filter($"k" >= 0L))
      val pruned = planned(q)
      q.groupBy($"ts".cast("date").cast("string").as("day"))
        .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents_sum"))
        .withColumn("base_filter_pruned_dirs",
          lit(if (pruned > 0 && total > 0 && pruned < total) 1L else 0L))
        .orderBy($"day")
    }),
    "q151_clone_materialize" -> ((s, dir) => {
      import s.implicits._
      // CLONE MATERIALIZE (round 12, PjClone.materialize — the deep-copy
      // half of SHALLOW CLONE): after a clone + DV delete, `CALL
      // pj.system.materialize` rewrites the external entries' LIVE rows
      // into table-local files in ONE commit; the SOURCE directory is
      // then deleted outright and the clone must keep serving the same
      // rows from its own bytes. DuckDB recomputes the surviving
      // aggregate.
      val src = java.nio.file.Files.createTempDirectory("pj_q151_src").toString
      val tgtDir = java.nio.file.Files.createTempDirectory("pj_q151_tgt")
      java.nio.file.Files.delete(tgtDir)
      val tgt = tgtDir.toString
      graft.Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_nationkey",
          round($"s_acctbal" * 100).cast("long").as("cents"))
        .repartition(2).write.format("pjparquet").mode("append")
        .option("log.enabled", "true").save(src)
      s.conf.set("spark.sql.catalog.pj_q151", "graft.sources.pjparquet.PjCatalog")
      s.sql(s"CALL pj_q151.system.clone(source => '$src', target => '$tgt')")
      s.sql(s"DELETE FROM pj_q151.`$tgt` WHERE s_suppkey % 7 = 0")
      val mat = s.sql(s"CALL pj_q151.system.materialize(table => '$tgt')").collect().head
      val fs = new org.apache.hadoop.fs.Path(tgt)
        .getFileSystem(s.sessionState.newHadoopConf())
      val snap = graft.sources.pjparquet.PjCommitLog.read(
        fs, new org.apache.hadoop.fs.Path(tgt),
        graft.sources.pjparquet.PjCommitLog.versions(
          fs, new org.apache.hadoop.fs.Path(tgt)).last)
      val allLocal = snap.entries.forall(e => !e.path.startsWith("/") && e.dv.isEmpty)
      // the source is disposable now: delete it and read the clone anyway
      fs.delete(new org.apache.hadoop.fs.Path(src), true)
      graft.sources.pjparquet.PjParquetTable.clearLayoutCache()
      graft.sources.pjparquet.PjCommitLog.clearSnapshotCache()
      s.read.format("pjparquet").load(tgt)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_supp"), sum($"cents").cast("long").as("cents_sum"))
        .withColumn("files_materialized", lit(mat.getLong(0)))
        .withColumn("entries_local_no_dv", lit(if (allLocal) 1L else 0L))
        .withColumn("source_deleted_clone_reads", lit(1L))
        .orderBy($"s_nationkey")
    }),
    "q132_vacuum_retention" -> ((s, dir) => {
      import s.implicits._
      // Time-based retention (PjVacuum.expireOlderThan — the Delta
      // `VACUUM ... RETAIN n HOURS` contract): three logged commits
      // (append, truncate-overwrite with keys +10, append of the <2
      // slice), then retention 0 ms keeps only HEAD. The overwrite's
      // retired v1 file is the ONLY unreferenced byte and must be the
      // one reclaimed; HEAD stays exact; and reading the expired v1
      // fails with the verbatim available-range error.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q132_ret").toString
      val region = graft.Tables.region(s, dir)
      region.coalesce(1).write.format("pjparquet")
        .mode("append").option("log.enabled", "true").save(tmp) // v1
      region.withColumn("r_regionkey", (col("r_regionkey") + 10).cast("int"))
        .coalesce(1).write.format("pjparquet").mode("overwrite").save(tmp) // v2
      region.filter($"r_regionkey" < 2).coalesce(1)
        .write.format("pjparquet").mode("append").save(tmp) // v3
      val rep = graft.sources.pjparquet.PjVacuum.expireOlderThan(
        s, tmp, retentionMillis = 0L)
      val errBit =
        try {
          s.read.format("pjparquet").option("versionAsOf", "1").load(tmp).count()
          0L
        } catch {
          case e: graft.core.PJException
              if e.getMessage.contains("version 1 does not exist") &&
                e.getMessage.contains("available: 3..3") => 1L
          case _: Exception => 0L
        }
      s.read.format("pjparquet").load(tmp)
        .agg(count(lit(1)).as("head_rows"),
          sum(col("r_regionkey")).cast("long").as("head_key_sum"))
        .select(
          lit(rep.versionsDropped).as("versions_dropped"),
          lit(rep.versionsKept).as("versions_kept"),
          lit(rep.filesReclaimed).as("files_reclaimed"),
          col("head_rows"), col("head_key_sum"),
          lit(errBit).as("expired_read_errors_with_range"))
    }),
    "q80_pjparquet_zordered_scan" -> ((s, dir) => {
      import s.implicits._
      // End-to-end form of ZOrderSpec's pruning proof on the product path:
      // z-order the fact table on (l_orderkey, l_partkey), write through
      // the pjparquet writer (sidecar-indexed), then run a two-dimensional
      // range scan off the indexed layout. Bounds derive from the data
      // (quarter spans in exact integer arithmetic) so the query is
      // scale-factor-independent; oracle = the same filter over the
      // original table — the re-layout must be lossless and the scan
      // exact.
      val li = graft.Tables.lineitem(s, dir)
      val tmp = fixtureDir("pj_q80_zorder", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.operators.ZOrder.zorderBy(
            li, Seq("l_orderkey", "l_partkey"), numPartitions = 4), d)
      }
      // Bounds at METADATA RATE: typed min/max pushdown (q93/q112 path)
      // answers from the index's chunk statistics as a zero-task
      // LocalTableScan, and the resulting LITERAL range predicates then
      // push into the z-ordered scan — where chunk stats prune
      // z-localized files and the reader's FilterPredicate drops row
      // groups. (The earlier broadcast-crossJoin formulation kept the
      // bounds non-literal, so nothing could push down and every run also
      // re-scanned lineitem for the range — the r8 q80 regression was
      // mostly that un-pushable shape.) All keys are positive, so Scala
      // Long division == SQL div == DuckDB // here.
      val b = pj(s, dir, "lineitem").agg(
        min($"l_orderkey").cast("long"), max($"l_orderkey").cast("long"),
        min($"l_partkey").cast("long"), max($"l_partkey").cast("long")).head()
      val (oMin, oMax, pMin, pMax) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
      val oHi = oMin + (oMax - oMin) / 4
      val pLo = pMin + (pMax - pMin) / 4
      val pHi = pMin + (pMax - pMin) / 2
      val scan = s.read.format("pjparquet").load(tmp)
        .filter($"l_orderkey" <= oHi && $"l_partkey" >= pLo && $"l_partkey" <= pHi)
      val boundsPushed = scan.queryExecution.executedPlan.collect {
        case bx: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bx
      }.exists { bx =>
        val d = bx.scan.description()
        d.contains("PushedFilters: [") && d.contains("l_orderkey") && d.contains("l_partkey")
      }
      scan.agg(
          count(lit(1)).as("n_rows"),
          round(sum($"l_quantity"), 2).as("qty_sum"),
          sum($"l_orderkey" * $"l_linenumber").as("key_checksum"))
        .withColumn("bounds_pushed", lit(if (boundsPushed) 1L else 0L))
    }),
    "q85_pjparquet_metadata_table" -> ((s, dir) => {
      import s.implicits._
      // Metadata-as-a-table (the library's parquet_metadata()): one row
      // per row group served from the PJ index layer with zero query-time
      // footer parses. DuckDB verifies the exactly-recomputable half
      // (summed per-rg row counts == the table's count(*)); the per-rg
      // structure is cross-validated against parquet-java's independent
      // footer parse in PjMetadataSpec.
      val md = graft.sources.pjparquet.PjMetadata.rowGroups(s, s"$dir/lineitem.parquet")
      md.agg(
          sum($"num_rows").as("total_rows"),
          (count(lit(1)) >= 1L).cast("long").as("rgs_positive"),
          (min($"compressed_bytes") > 0L).cast("long").as("bytes_ok"),
          (countDistinct($"file") === 1L).cast("long").as("one_file"))
    }),
    "q89_compaction" -> ((s, dir) => {
      import s.implicits._
      // Small-file compaction (table maintenance at 100 TB): shatter the
      // documents table into 6 tiny files per lang partition, compact with
      // PjCompaction (one distributed rewrite job for all partitions),
      // then re-read through pjparquet. The oracle recomputes the content
      // half from the original table — compaction must be lossless — and
      // the structural invariants (file counts fell to the per-partition
      // bin counts, every partition survived, sidecars regenerated) ride
      // as exact 0/1 columns.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q89_compact").toString
      val docs = graft.Tables.documents(s, dir)
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        docs.repartition(6), tmp, partitionBy = Seq("lang"))
      val nLangs = docs.select($"lang").distinct().count()
      val report = graft.sources.pjparquet.PjCompaction.compact(
        s, tmp, targetBytes = 256L * 1024 * 1024)
      val after = s.read.format("pjparquet").load(tmp)
      after.agg(
        count(lit(1)).as("n_docs"),
        sum($"doc_id").as("doc_checksum"),
        sum(length($"text")).cast("long").as("text_len"),
        countDistinct($"lang").as("langs"),
        lit(if (report.smallFiles == 6 * nLangs) 1L else 0L).as("consumed_all_small"),
        lit(if (report.compactedInto == nLangs) 1L else 0L).as("one_file_per_partition"),
        lit(if (report.filesAfter == nLangs) 1L else 0L).as("files_reduced"))
    }),
    "q122_optimize_zorder" -> ((s, dir) => {
      import s.implicits._
      // OPTIMIZE ... ZORDER BY lifecycle (PjCompaction.optimize, the
      // Delta-style table-maintenance pass): an INGESTION-ordered layout
      // (sorted by l_orderkey only, many small row groups) cannot prune a
      // band scan on the second dimension; one optimize re-clusters every
      // file on the (l_orderkey, l_partkey) Morton curve, drops consumed
      // files + sidecars + the stale natural-sort marker, and re-indexes.
      // The oracle recomputes the band content from the original table
      // (losslessness); the structural facts — the optimized layout
      // prunes the band at planning time, improves on the ingestion
      // order, the marker is gone, sidecars track files — ride as bits.
      // Band bounds use q80's integer arithmetic so every engine agrees.
      val b = pj(s, dir, "lineitem").agg(
        min($"l_partkey").cast("long"), max($"l_partkey").cast("long")).head()
      val (pMin, pMax) = (b.getLong(0), b.getLong(1))
      val pLo = pMin + (pMax - pMin) / 4
      val pHi = pMin + (pMax - pMin) / 2
      def plannedRgs(path: String, filtered: Boolean): Int = {
        val iso = s.newSession()
        iso.conf.set("spark.sql.adaptive.enabled", "false")
        val base = iso.read.format("pjparquet").load(path)
        val df = (if (filtered) base.filter(col("l_partkey") >= pLo && col("l_partkey") <= pHi)
                  else base).select(col("l_quantity"))
        df.queryExecution.executedPlan.collect {
          case bx: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => bx
        }.flatMap(_.partitions.flatten).collect {
          case p: graft.sources.pjparquet.PjInputPartition => p.rowGroups.length
        }.sum
      }
      val tmp = fixtureDir("pj_q122_optimize", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.lineitem(s, dir)
            .select($"l_orderkey", $"l_partkey", $"l_quantity")
            .repartitionByRange(8, $"l_orderkey").sortWithinPartitions("l_orderkey"),
          d, options = Map("parquet.block.size" -> (64 * 1024).toString))
        val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sessionState.newHadoopConf())
        graft.sources.pjparquet.PjSortMarker.write(
          fs, new org.apache.hadoop.fs.Path(d), Seq("l_orderkey"))
        q122BeforeRgs.put(d, Int.box(plannedRgs(d, filtered = true)))
        // scale-independent fixture: ~8 optimized files at ANY sf, so the
        // band scan always has file granularity to prune (a fixed byte
        // target collapses sf0.001 into one unprunable file)
        val totalBytes = Option(new java.io.File(d).listFiles()).toSeq.flatten
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
          .map(_.length).sum
        graft.sources.pjparquet.PjCompaction.optimize(
          s, d, Seq("l_orderkey", "l_partkey"),
          targetBytes = math.max(8L * 1024, totalBytes / 8), bits = 10)
        ()
      }
      val beforeFiltered = q122BeforeRgs.get(tmp).intValue()
      val afterFiltered = plannedRgs(tmp, filtered = true)
      val afterTotal = plannedRgs(tmp, filtered = false)
      val prunes = afterFiltered > 0 && afterFiltered < afterTotal
      val improved = afterFiltered * 2 <= beforeFiltered
      val markerGone = !new java.io.File(tmp, "_pj_sort").exists()
      def walkFiles(suffix: String): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
          else if (f.getName.endsWith(suffix) &&
            (suffix != ".parquet" || (!f.getName.startsWith("_") && !f.getName.startsWith(".")))) 1
          else 0
        walk(new java.io.File(tmp))
      }
      val sidecarsTrack = walkFiles(".parquet.index") == walkFiles(".parquet")
      s.read.format("pjparquet").load(tmp)
        .filter($"l_partkey" >= pLo && $"l_partkey" <= pHi)
        .agg(
          count(lit(1)).as("n_rows"),
          round(sum($"l_quantity"), 2).as("qty_sum"),
          sum($"l_orderkey" * $"l_partkey").as("key_checksum"))
        .withColumn("optimized_prunes", lit(if (prunes) 1L else 0L))
        .withColumn("improved_vs_ingest_order", lit(if (improved) 1L else 0L))
        .withColumn("sort_marker_dropped", lit(if (markerGone) 1L else 0L))
        .withColumn("sidecars_track_files", lit(if (sidecarsTrack) 1L else 0L))
    }),
    "q93_count_pushdown" -> ((s, dir) => {
      import s.implicits._
      // Complete count(*) pushdown: the unfiltered global count over the
      // fact table must come from the index's row_numbers section alone —
      // the physical plan is a driver-local scan (LocalTableScan, zero
      // tasks, zero data/footer reads). The filtered count on the same
      // relation must FALL BACK to the batch scan. Both values are exact
      // against the oracle; the plan-shape facts ride as 0/1 columns.
      val rel = pj(s, dir, "lineitem")
      val pushed = rel.agg(
        count(lit(1)).as("n_rows"),
        min($"l_orderkey").as("min_okey"), max($"l_orderkey").as("max_okey"),
        min($"l_linenumber").as("min_line"), max($"l_linenumber").as("max_line"),
        count($"l_returnflag").as("n_flags"))
      val pushedPlan = pushed.queryExecution.executedPlan.toString
      val fallback = rel.filter($"l_quantity" > 25.0).agg(count(lit(1)).as("n_big"))
      val fallbackPlan = fallback.queryExecution.executedPlan.toString
      pushed.crossJoin(fallback).select(
        col("n_rows"), col("min_okey"), col("max_okey"),
        col("min_line"), col("max_line"), col("n_flags"), col("n_big"),
        lit(if (pushedPlan.contains("LocalTableScan") &&
          !pushedPlan.contains("BatchScan")) 1L else 0L).as("metadata_only"),
        lit(if (fallbackPlan.contains("LocalTableScan")) 0L else 1L).as("filtered_scans_data"))
    }),
    "q95_grouped_count_pushdown" -> ((s, dir) => {
      import s.implicits._
      // Per-partition stats at metadata rate: GROUP BY the Hive partition
      // column with count/min/max answered entirely from the per-directory
      // indexes — the plan is a LocalTableScan (zero tasks), which is what
      // "how big is each partition" costs on a 10k-partition 100 TB table.
      // Fixture (documents partitioned by lang) is built once per JVM —
      // this query measures the READ.
      val tmp = fixtureDir("pj_q95_bylang", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.documents(s, dir), d, partitionBy = Seq("lang"))
      }
      val grouped = s.read.format("pjparquet").load(tmp)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc"),
          max($"doc_id").as("max_doc"))
      val planStr = grouped.queryExecution.executedPlan.toString
      grouped.withColumn("metadata_only",
          lit(if (planStr.contains("LocalTableScan")) 1L else 0L))
        .orderBy($"lang")
    }),
    "q94_schema_evolution" -> ((s, dir) => {
      import s.implicits._
      // Additive schema evolution on the index-planned path: generation 1
      // writes (key, name, region), generation 2 adds name_len. The
      // mergeSchema read must union the schemas and null-fill the old
      // files; the oracle recomputes every aggregate from the original
      // table with the generation split replayed in SQL.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q94_evo").toString
      val n = graft.Tables.nation(s, dir)
      n.filter($"n_nationkey" < 12)
        .select($"n_nationkey", $"n_name", $"n_regionkey")
        .coalesce(1).write.mode("append").parquet(tmp)
      n.filter($"n_nationkey" >= 12)
        .select($"n_nationkey", $"n_name", $"n_regionkey",
          length($"n_name").cast("long").as("name_len"))
        .coalesce(1).write.mode("append").parquet(tmp)
      graft.sources.pjparquet.PjIndexJob.generateAll(s, tmp)
      s.read.format("pjparquet").option("mergeSchema", "true").load(tmp)
        .agg(
          count(lit(1)).as("n_rows"),
          sum($"n_nationkey").as("key_sum"),
          count($"name_len").as("evolved_rows"),
          coalesce(sum($"name_len"), lit(0L)).as("evolved_sum"),
          sum(when($"name_len".isNull, $"n_regionkey")).as("legacy_region_sum"))
    }),
    "q99_partition_delete" -> ((s, dir) => {
      import s.implicits._
      // SQL DELETE of whole partitions at metadata rate: seed a region-
      // partitioned copy of nation, DELETE one region (files + sidecars
      // drop, zero data I/O — SupportsDelete with the exact three-valued
      // partition evaluator), then aggregate what survives. The oracle
      // replays the delete as a WHERE clause over the original table.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q99_delete").toString
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        graft.Tables.nation(s, dir), tmp, partitionBy = Seq("n_regionkey"))
      s.sql("DROP TABLE IF EXISTS pj_q99_t")
      s.sql(s"CREATE TABLE pj_q99_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q99_t WHERE n_regionkey = 0")
      s.sql("""SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
              |       count(*) AS n_nations,
              |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
              |FROM pj_q99_t GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
    }),
    "q100_sql_update" -> ((s, dir) => {
      // Row-level SQL UPDATE (copy-on-write ReplaceData, PjRowLevelOperation):
      // rewrite exactly the files whose chunk stats admit o_orderstatus='F',
      // flip their priority, and leave every other file byte-identical. The
      // oracle replays the update as a CASE over the original table.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q100_update").toString
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        graft.Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_orderpriority"), tmp)
      s.sql("DROP TABLE IF EXISTS pj_q100_t")
      s.sql(s"CREATE TABLE pj_q100_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("UPDATE pj_q100_t SET o_orderpriority = 'X-EXPEDITED' WHERE o_orderstatus = 'F'")
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
              |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
              |FROM pj_q100_t GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),
    "q101_merge_upsert" -> ((s, dir) => {
      import s.implicits._
      // SQL MERGE INTO (upsert): target = every 3rd customer, source = every
      // 2nd with a 100k-cent bonus; matched rows update, unmatched insert.
      // Balances are integer cents so the oracle compares exactly.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q101_merge").toString
      val cust = graft.Tables.customer(s, dir)
        .select($"c_custkey", ($"c_acctbal" * 100).cast("long").as("bal_cents"),
          $"c_nationkey".cast("long").as("c_nationkey"))
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        cust.filter($"c_custkey" % 3 === 0), tmp)
      s.sql("DROP TABLE IF EXISTS pj_q101_t")
      s.sql(s"CREATE TABLE pj_q101_t USING pjparquet OPTIONS (path '$tmp')")
      cust.filter($"c_custkey" % 2 === 0)
        .withColumn("bal_cents", $"bal_cents" + 100000L)
        .createOrReplaceTempView("pj_q101_src")
      s.sql("""MERGE INTO pj_q101_t AS t USING pj_q101_src AS s ON t.c_custkey = s.c_custkey
              |WHEN MATCHED THEN UPDATE SET bal_cents = s.bal_cents
              |WHEN NOT MATCHED THEN INSERT (c_custkey, bal_cents, c_nationkey)
              |  VALUES (s.c_custkey, s.bal_cents, s.c_nationkey)""".stripMargin)
      s.sql("""SELECT c_nationkey, count(*) AS n_cust,
              |       CAST(sum(bal_cents) AS BIGINT) AS bal_sum
              |FROM pj_q101_t GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    }),
    "q102_row_delete" -> ((s, dir) => {
      // Row-level SQL DELETE with a data-column predicate (the case the
      // metadata-rate path refuses): copy-on-write replaces only the files
      // whose stats admit o_totalprice < 100000.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q102_delete").toString
      graft.sources.pjparquet.PjWriter.writeWithIndex(
        graft.Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice"), tmp)
      s.sql("DROP TABLE IF EXISTS pj_q102_t")
      s.sql(s"CREATE TABLE pj_q102_t USING pjparquet OPTIONS (path '$tmp')")
      s.sql("DELETE FROM pj_q102_t WHERE o_totalprice < 100000")
      s.sql("""SELECT o_orderstatus, count(*) AS n_orders,
              |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
              |FROM pj_q102_t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    }),
    "q103_bloom_point_lookup" -> ((s, dir) => {
      import s.implicits._
      // Bloom-sidecar file skipping (PjBloom): the table is striped by
      // o_orderkey % 8, so every file spans ~the full key range and chunk
      // min/max stats admit all of them — only the per-file blooms can
      // prove files keyless. The point lookup must plan tasks for at most
      // 1 + false-positive files out of 8 (the plan-shape fact rides as a
      // 0/1 column); values are oracle-exact. Fixture built once per JVM.
      val tmp = fixtureDir("pj_q103_bloom", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.orders(s, dir)
            .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
            .repartitionByRange(8, $"o_orderkey" % 8), d)
        graft.sources.pjparquet.PjBloomJob.generate(s, d, Seq("o_orderkey"), fpp = 0.001)
      }
      val hit = s.read.format("pjparquet").load(tmp)
        .filter($"o_orderkey" === 7L)
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          round($"o_totalprice", 2).as("price"))
      val tasks = hit.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputRDD.getNumPartitions
      }.sum
      hit.withColumn("bloom_pruned", lit(if (tasks <= 2) 1L else 0L))
    }),
    "q110_filtered_count_pushdown" -> ((s, dir) => {
      import s.implicits._
      // Aggregate pushdown UNDER a partition predicate: the equality on
      // the partition column is claimed as fully pushed (files either
      // wholly match or drop — three-valued exact evaluation), so
      // count/min/max over the selected partitions stay a zero-task
      // LocalTableScan. `SELECT count(*) WHERE day = X` over a 10k-
      // partition 100 TB table is THE metadata query operators run daily.
      val tmp = fixtureDir("pj_q95_bylang", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.documents(s, dir), d, partitionBy = Seq("lang"))
      }
      val agg = s.read.format("pjparquet").load(tmp)
        .filter($"lang".isin("en", "de"))
        .agg(
          count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc"),
          max($"doc_id").as("max_doc"))
      val planStr = agg.queryExecution.executedPlan.toString
      agg.withColumn("metadata_only",
        lit(if (planStr.contains("LocalTableScan") &&
          !planStr.contains("BatchScan")) 1L else 0L))
    }),
    "q112_typed_minmax_pushdown" -> ((s, dir) => {
      import s.implicits._
      // Typed min/max at metadata rate: timestamp (NTZ micros), string
      // (arrow-written bounds are witnessed values), and double aggregates
      // answered entirely from v2 chunk statistics in the index — a
      // zero-task LocalTableScan, the 100 TB answer to "what date range /
      // key range does this table span". The second aggregation proves the
      // refusal side: l_discount's minimum bound is the writer's
      // conventional -0.0 (not a witnessed value), so MIN(l_discount)
      // must fall back to a real scan — and still agree with the oracle.
      val rel = pj(s, dir, "lineitem")
      val pushed = rel.agg(
        count(lit(1)).as("n_rows"),
        min($"l_shipdate").cast("string").as("min_ship"),
        max($"l_shipdate").cast("string").as("max_ship"),
        min($"l_returnflag").as("min_flag"),
        max($"l_linestatus").as("max_status"),
        round(min($"l_quantity"), 2).as("min_qty"),
        round(max($"l_quantity"), 2).as("max_qty"))
      val pushedPlan = pushed.queryExecution.executedPlan.toString
      val fallback = rel.agg(min($"l_discount").as("min_disc"))
      val fallbackPlan = fallback.queryExecution.executedPlan.toString
      pushed.crossJoin(fallback).select(
        col("n_rows"), col("min_ship"), col("max_ship"),
        col("min_flag"), col("max_status"), col("min_qty"), col("max_qty"),
        col("min_disc"),
        lit(if (pushedPlan.contains("LocalTableScan") &&
          !pushedPlan.contains("BatchScan")) 1L else 0L).as("metadata_only"),
        lit(if (fallbackPlan.contains("LocalTableScan")) 0L else 1L)
          .as("zero_bound_scans_data"))
    }),
    "q113_sorted_layout" -> ((s, dir) => {
      import s.implicits._
      // Sorted-layout declaration end-to-end: the write declares
      // `sort.columns=l_orderkey` (an in-task sort via
      // RequiresDistributionAndOrdering), the commit publishes the
      // `_pj_sort` marker, and the scan reports the ordering
      // (SupportsReportOrdering) — so a per-partition sort on the same key
      // above the scan is ELIDED from the physical plan. At 100 TB this is
      // what makes a key-sorted layout pay off: downstream sort-merge
      // consumers read pre-sorted splits instead of re-sorting the table.
      val tmp = fixtureDir("pj_q113_sorted", dir) { d =>
        graft.Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_partkey", $"l_quantity")
          .write.format("pjparquet").option("sort.columns", "l_orderkey")
          .mode("overwrite").save(d)
      }
      val t = s.read.format("pjparquet").load(tmp)
      val probe = t.sortWithinPartitions($"l_orderkey")
      val sortElided = probe.queryExecution.executedPlan
        .collect { case e: org.apache.spark.sql.execution.SortExec => e }.isEmpty
      t.groupBy(($"l_orderkey" % 10).cast("long").as("okey_mod"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum($"l_quantity"), 2).as("sum_qty"),
          sum($"l_partkey").cast("long").as("part_sum"))
        .withColumn("sort_elided", lit(if (sortElided) 1L else 0L))
        .orderBy($"okey_mod")
    }),
    "q115_topn_pushdown" -> ((s, dir) => {
      import s.implicits._
      // ORDER BY + LIMIT over a sorted layout (SupportsPushDownTopN): the
      // scan plans only the row groups covering n rows per file — top-10
      // of a 100k-row-group key-sorted table reads one row group per file
      // instead of the table. Order on (l_orderkey, l_linenumber) is a
      // UNIQUE tuple, so the top-100 row set is engine-deterministic and
      // the aggregate below is oracle-exact. Plan bit = the scan claims
      // "PushedTopN" in its description.
      val tmp = fixtureDir("pj_q115_sorted2", dir) { d =>
        graft.Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .write.format("pjparquet")
          .option("sort.columns", "l_orderkey,l_linenumber")
          .mode("overwrite").save(d)
      }
      val top = s.read.format("pjparquet").load(tmp)
        .orderBy($"l_orderkey", $"l_linenumber").limit(100)
      val claimed = top.queryExecution.executedPlan
        .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
        .exists(_.scan.description().contains("PushedTopN: 100 ASC"))
      top.agg(
          count(lit(1)).as("n_rows"),
          sum($"l_orderkey").cast("long").as("okey_sum"),
          sum($"l_linenumber").cast("long").as("line_sum"),
          round(sum($"l_quantity"), 2).as("sum_qty"),
          max($"l_orderkey").cast("long").as("max_okey"))
        .withColumn("topn_pushed", lit(if (claimed) 1L else 0L))
    }),
    "q114_pq_persisted_index" -> ((s, dir) => {
      // Persisted PQ ANN artifacts (PqIndex): codebooks + codes live as a
      // commit-maintained table under the corpus root, so similarity
      // search SCANS stored codes instead of re-encoding the corpus per
      // query — at 100 TB that's the difference between an index and a
      // scan. Plan-shape bits prove it: the analyzed plan contains a
      // pjparquet relation with pq_codes in its output (codes READ, not
      // computed) and the artifact directory exists on disk. Recall vs
      // the exact brute-force top-k stays oracle-checked (same m/codes/
      // refine as q104, measured 98/100/86 at sf0.001/0.01/0.1).
      val k = 5
      val root = fixtureDir("pj_q114_pqindex", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")), d)
        PqIndex.build(s, d, "vec_id", "embedding",
          graft.Tables.embeddingDim, m = 8, codes = 64)
      }
      val probes = graft.Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      // both result frames are <= probes*k rows but feed TWO aggregate
      // subtrees each — localCheckpoint (q104/q43 convention: eager, tiny,
      // and unlike persist() the computing plan keeps AQE)
      // plan bit read BEFORE the checkpoint barrier (localCheckpoint
      // truncates the analyzed plan to a LogicalRDD)
      val indexedPlan = PqIndex.topK(s, root, probes, k = k, refineFactor = 16)
      val indexed = indexedPlan.localCheckpoint()
      val codesScanned = indexedPlan.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
            if r.output.exists(_.name == "pq_codes") => r
      }.nonEmpty
      val artifactPersisted =
        new java.io.File(s"$root/_pq_index/codes").isDirectory &&
          new java.io.File(s"$root/_pq_index/_meta.parquet").isDirectory
      val exact = PipelineOps.cosineTopK(graft.Tables.embeddings(s, dir), probes, k = k)
        .localCheckpoint()
      val shape = indexed.groupBy(col("probe_id"))
        .agg(count(lit(1)).as("_n"), countDistinct(col("neighbor_id")).as("_nd"))
        .agg(
          count(lit(1)).as("probes_returned"),
          coalesce(min((col("_n") === k.toLong && col("_nd") === k.toLong).cast("long")),
            lit(1L)).as("per_probe_shape_ok"))
      val hits = indexed.select(col("probe_id"), col("neighbor_id"))
        .join(exact.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("_hits"))
      val nExact = exact.agg(count(lit(1)).as("_n_exact"))
      shape.crossJoin(hits).crossJoin(nExact).select(
        col("probes_returned"), col("per_probe_shape_ok"),
        lit(if (codesScanned) 1L else 0L).as("codes_scanned_not_encoded"),
        lit(if (artifactPersisted) 1L else 0L).as("artifact_persisted"),
        (col("_hits") * 100L >= col("_n_exact") * 80L).cast("long").as("recall_ge_80"))
    }),
    "q116_ivfpq_ann" -> ((s, dir) => {
      // IVF-PQ (FAISS `IVFx,PQy`) over the PERSISTED index: the build fans
      // codes across `list=` partition directories (nearest coarse
      // centroid), and a query with nprobe scans only its probed lists —
      // because `list` is a Hive partition column, that is PLANNING-TIME
      // partition pruning: at 100 TB the ADC stage reads nprobe/nlist of
      // codes that are already ~32x smaller than the float corpus. Plan
      // fact computed on an isolated AQE-off session (q111 convention)
      // with a SINGLE probe — the per-probe pruning mechanism — since a
      // 10-probe batch legitimately unions to all lists: its codes scan
      // plans files only under <= nprobe of the nlist list dirs. Recall
      // vs exact brute force stays oracle-checked across the 10-probe
      // batch (nprobe=6 of nlist=16 keeps >=60 on all SFs).
      val k = 5
      val nprobe = 6
      val root = fixtureDir("pj_q116_ivfpq", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")), d)
        PqIndex.build(s, d, "vec_id", "embedding",
          graft.Tables.embeddingDim, m = 8, codes = 64, nlist = 16)
      }
      val iso = s.newSession()
      iso.conf.set("spark.sql.adaptive.enabled", "false")
      // reconcile=false (r19): plan-only probe — the real topK below
      // reconciles; a second corpus walk + meta-read job here cannot
      // change the probed plan
      val routedIso = PqIndex.topK(iso, root,
        graft.Tables.embeddings(iso, dir).filter(col("vec_id") < 1),
        k = k, refineFactor = 16, nprobe = nprobe, reconcile = false)
      val codeFiles = routedIso.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.flatMap(_.partitions.flatten).collect {
        case p: graft.sources.pjparquet.PjInputPartition => p.filePath
      }.filter(_.contains("_pq_index/codes"))
      val plannedLists = codeFiles
        .flatMap("list=([0-9]+)".r.findFirstMatchIn(_)).map(_.group(1)).toSet
      val allLists = Option(new java.io.File(s"$root/_pq_index/codes").listFiles())
        .toSeq.flatten.filter(_.isDirectory)
        .flatMap(src => Option(src.listFiles()).toSeq.flatten)
        .filter(d => d.isDirectory && d.getName.startsWith("list="))
        .map(_.getName).toSet
      val listsPruned = codeFiles.nonEmpty &&
        plannedLists.size < allLists.size && plannedLists.size <= nprobe
      val probes = graft.Tables.embeddings(s, dir).filter(col("vec_id") < 10)
      // q104/q43 convention: both frames are <= probes*k rows but feed two
      // aggregate subtrees each — localCheckpoint so each pipeline runs
      // once (eager, tiny; persist() would lose AQE inside the cached plan)
      val routed = PqIndex.topK(s, root, probes, k = k, refineFactor = 16,
        nprobe = nprobe).localCheckpoint()
      val exact = PipelineOps.cosineTopK(graft.Tables.embeddings(s, dir), probes, k = k)
        .localCheckpoint()
      val shape = routed.groupBy(col("probe_id"))
        .agg(count(lit(1)).as("_n"), countDistinct(col("neighbor_id")).as("_nd"))
        .agg(
          count(lit(1)).as("probes_returned"),
          coalesce(min((col("_n") === k.toLong && col("_nd") === k.toLong).cast("long")),
            lit(1L)).as("per_probe_shape_ok"))
      val hits = routed.select(col("probe_id"), col("neighbor_id"))
        .join(exact.select(col("probe_id"), col("neighbor_id")),
          Seq("probe_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("_hits"))
      val nExact = exact.agg(count(lit(1)).as("_n_exact"))
      shape.crossJoin(hits).crossJoin(nExact).select(
        col("probes_returned"), col("per_probe_shape_ok"),
        lit(if (listsPruned) 1L else 0L).as("lists_pruned_at_planning"),
        (col("_hits") * 100L >= col("_n_exact") * 60L).cast("long").as("recall_ge_60"))
    }),
    "q111_nested_pjparquet" -> ((s, dir) => {
      import s.implicits._
      // Nested-schema INDEXED planning (PJ_3 subtree-offset extension —
      // the PJ_2 compat format is flat-only per the reference restriction,
      // `palletjack.cc:266-279,483-487`): documents re-shaped with a
      // STRUCT column are written through the pjparquet SINK (the commit
      // builds a PJ_3 sidecar for the nested file), read back via the
      // explicit pjparquet FORMAT, struct fields projected and
      // aggregated. Plan bits — computed on an ISOLATED session so no
      // shared conf mutates — prove the nested scan planned SPLICED
      // splits (zero full footer parses) whose pruned footers carry ONLY
      // the requested top-level subtree, and that a flat scan in the same
      // session kept PJ_2 spliced planning.
      val tmp = fixtureDir("pj_q111_nested", dir) { d =>
        graft.Tables.documents(s, dir)
          .select($"doc_id",
            struct($"lang".as("lang"), $"n_chars".as("n_chars")).as("meta"))
          .write.format("pjparquet").mode("overwrite").save(d)
      }
      def partsOf(df: DataFrame): Seq[graft.sources.pjparquet.PjInputPartition] =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.flatMap(_.partitions.flatten).collect {
          case p: graft.sources.pjparquet.PjInputPartition => p
        }
      val iso = s.newSession()
      iso.conf.set("spark.sql.adaptive.enabled", "false")
      val nestedParts = partsOf(iso.read.format("pjparquet").load(tmp).select(col("doc_id")))
      val flatParts = partsOf(
        iso.read.format("pjparquet").load(s"$dir/documents.parquet").select(col("doc_id")))
      val nestedSpliced = nestedParts.nonEmpty && nestedParts.forall(!_.rawFooter)
      // the doc_id-only projection's spliced footer must have dropped the
      // meta subtree entirely — metadata-level column pruning for nested
      val subtreePruned = nestedParts.nonEmpty && nestedParts.forall { p =>
        val mt = graft.core.PalletJack.materialize(p.prunedFooter)
          .getFileMetaData.getSchema
        mt.getFieldCount == 1 && mt.getFields.get(0).getName == "doc_id"
      }
      val flatSpliced = flatParts.nonEmpty && flatParts.forall(!_.rawFooter)
      s.read.format("pjparquet").load(tmp)
        .select($"meta.lang".as("lang"), $"meta.n_chars".as("n_chars"), $"doc_id")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"),
          sum($"doc_id").as("id_sum"))
        .withColumn("nested_spliced_planned", lit(if (nestedSpliced) 1L else 0L))
        .withColumn("nested_subtree_pruned", lit(if (subtreePruned) 1L else 0L))
        .withColumn("flat_index_planned", lit(if (flatSpliced) 1L else 0L))
        .orderBy($"lang")
    }),
    "q108_spj_join" -> ((s, dir) => {
      import s.implicits._
      // Storage-partitioned join (SPJ): both sides are Hive-partitioned on
      // lang, the scans report KeyGroupedPartitioning, and with v2
      // bucketing on the join + same-key aggregation plan ZERO hash
      // exchanges — on a 100 TB co-partitioned fact-fact join this moves
      // no bytes across the cluster. The plan-shape fact is computed on an
      // isolated child session carrying the SPJ confs (q111 convention);
      // values are oracle-exact either way.
      val factDir = fixtureDir("pj_q95_bylang", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.documents(s, dir), d, partitionBy = Seq("lang"))
      }
      val statsDir = fixtureDir("pj_q108_stats", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.documents(s, dir).groupBy($"lang")
            .agg(count(lit(1)).as("lang_total")),
          d, partitionBy = Seq("lang"))
      }
      def joined(sess: org.apache.spark.sql.SparkSession) =
        sess.read.format("pjparquet").load(factDir)
          .join(sess.read.format("pjparquet").load(statsDir), Seq("lang"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_sum"),
            max(col("lang_total")).as("lang_total"))
          .orderBy(col("lang"))
      // Plan-shape fact is computed on an isolated child session with SPJ
      // confs set there (shared catalog + context, private SQLConf) — the
      // harness session's planning conf is never mutated, so concurrently
      // built queries can't observe the SPJ settings.
      val iso = s.newSession()
      iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val noShuffle = !joined(iso).queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning")
      joined(s).withColumn("spj_no_shuffle", lit(if (noShuffle) 1L else 0L))
    }),
    "q98_runtime_pruned_join" -> ((s, dir) => {
      import s.implicits._
      // Runtime (join-driven) file pruning — dynamic partition pruning on
      // the pjparquet source: the dim side's surviving join keys prune the
      // lang-partitioned fact's directories at RUNTIME (the scan offers its
      // partition columns as runtime filter attributes and re-plans). The
      // dim is file-backed with a selective filter on a NON-join column, so
      // the values reaching the fact are only known after the dim scan —
      // exactly the shape where static pruning can't help. Fixture shares
      // q95's lang-partitioned documents layout.
      val factTmp = fixtureDir("pj_q95_bylang", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.documents(s, dir), d, partitionBy = Seq("lang"))
      }
      val dimTmp = fixtureDir("pj_q98_dim", dir) { d =>
        Seq(("en", "anglo"), ("de", "euro"), ("fr", "euro"), ("es", "latam"), ("zh", "cjk"))
          .toDF("dlang", "family").coalesce(1).write.mode("overwrite").parquet(d)
      }
      val fact = s.read.format("pjparquet").load(factTmp)
      val dim = s.read.parquet(dimTmp).filter($"family" === "euro")
      val joined = fact.join(broadcast(dim), $"lang" === $"dlang")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("doc_sum"))
      val planStr = joined.queryExecution.executedPlan.toString
      joined
        .withColumn("runtime_pruned",
          lit(if (planStr.contains("dynamicpruning")) 1L else 0L))
        .orderBy($"lang")
    }),
    "q97_limit_pushdown" -> ((s, dir) => {
      import s.implicits._
      // LIMIT at row-group granularity: the scan plans only the leading
      // row groups whose index row counts cover the limit (PushedLimit in
      // the scan description), Spark's own limit still applies on top, so
      // count-over-limit is exact and engine-independent even though the
      // row SET isn't. Fixture: orders as one multi-row-group file (~64 KiB
      // groups), built once per JVM.
      val tmp = fixtureDir("pj_q97_limit", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.orders(s, dir).coalesce(1).sortWithinPartitions("o_orderkey"),
          d, options = Map("parquet.block.size" -> (64 * 1024).toString))
      }
      val limited = s.read.format("pjparquet").load(tmp).limit(500)
      val agg = limited.agg(count(lit(1)).as("n_limited"))
      val planStr = agg.queryExecution.executedPlan.toString
      agg.select(
        col("n_limited"),
        lit(if (planStr.contains("PushedLimit: 500")) 1L else 0L).as("limit_pushed"))
    }),
    "q96_streaming_ingest" -> ((s, dir) => {
      import s.implicits._
      // Micro-batch streaming READ of a pjparquet directory: the whole
      // customer table must arrive through the offset-watermark source
      // exactly once (AvailableNow drains everything in one run), with
      // schema and planning from the sidecar indexes. Oracle = the same
      // aggregate straight off the customer table, so any dropped or
      // duplicated file changes the counts. Source layout is a per-JVM
      // fixture (this query measures the streaming read, not the write);
      // checkpoint + memory sink are fresh per call so re-runs re-ingest.
      val src = fixtureDir("pj_q96_stream_src", dir) { d =>
        graft.sources.pjparquet.PjWriter.writeWithIndex(
          graft.Tables.customer(s, dir).repartition(4), d)
      }
      val ckpt = java.nio.file.Files.createTempDirectory("pj_q96_ckpt").toString
      val tbl = s"pj_q96_out_${streamRuns.incrementAndGet()}"
      val q = s.readStream.format("pjparquet").load(src)
        .writeStream.format("memory").queryName(tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination(180000)
      finally if (q.isActive) q.stop()
      s.table(tbl)
        .groupBy($"c_mktsegment")
        .agg(
          count(lit(1)).as("n_cust"),
          sum($"c_custkey").as("key_sum"),
          sum($"c_nationkey").as("nation_sum"))
        .orderBy($"c_mktsegment")
    }),
    "q92_vacuum" -> ((s, dir) => {
      import s.implicits._
      // Directory hygiene: write an indexed table, plant the two garbage
      // classes a real fleet accumulates (an orphan sidecar from a manual
      // delete, a dead compaction work dir with a zombie data file), then
      // vacuum. The oracle half is content (vacuum must touch no live
      // bytes — the zombie file must NOT leak into reads); the structural
      // half (exactly the planted garbage collected, sidecar fleet
      // intact) rides as 0/1 columns.
      val tmp = java.nio.file.Files.createTempDirectory("pj_q92_vacuum").toString
      val docs = graft.Tables.documents(s, dir)
      graft.sources.pjparquet.PjWriter.writeWithIndex(docs.repartition(4), tmp)
      def countSidecars(): Long =
        Option(new java.io.File(tmp).listFiles()).toSeq.flatten
          .count(_.getName.endsWith(".parquet.index")).toLong
      val liveSidecars = countSidecars()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/.gone.parquet.index"), Array[Byte](1))
      val work = new java.io.File(s"$tmp/.compact_tmp_dead")
      work.mkdirs()
      docs.limit(10).write.mode("overwrite").parquet(s"$tmp/.compact_tmp_dead/z")
      val report = graft.sources.pjparquet.PjVacuum.clean(s, tmp)
      s.read.format("pjparquet").load(tmp).agg(
        count(lit(1)).as("n_docs"),
        sum($"doc_id").as("doc_checksum"),
        lit(if (report.orphanSidecars == 1) 1L else 0L).as("orphan_collected"),
        lit(if (report.workDirs == 1) 1L else 0L).as("workdir_collected"),
        lit(if (countSidecars() == liveSidecars) 1L else 0L).as("live_sidecars_intact"))
    }))

  def oracles: Map[String, String] = Map(
    "q155_row_tracking" ->
      """SELECT CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 1000
        |            ELSE s_nationkey END AS n,
        |       count(*) AS n_supp,
        |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS dv_kept_ids,
        |       CAST(1 AS BIGINT) AS compact_kept_ids,
        |       CAST(1 AS BIGINT) AS compact_preserved_rows,
        |       CAST(1 AS BIGINT) AS compact_cdf_empty_no_scan,
        |       CAST(1 AS BIGINT) AS cow_update_kept_ids,
        |       CAST(1 AS BIGINT) AS cow_delete_kept_ids,
        |       CAST(1 AS BIGINT) AS ids_unique
        |FROM supplier WHERE s_suppkey % 7 <> 0 AND s_suppkey % 11 <> 0
        |GROUP BY n ORDER BY n""".stripMargin,
    "q158_scoped_compaction" ->
      """SELECT CAST(s_suppkey % 3 AS VARCHAR) AS flag,
        |       count(*) AS n_supp,
        |       CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |       CAST(sum(s_nationkey) AS BIGINT) AS nat_sum,
        |       CAST(1 AS BIGINT) AS scoped_only,
        |       CAST(1 AS BIGINT) AS nonpartition_refused
        |FROM supplier GROUP BY flag ORDER BY flag""".stripMargin,
    "q159_merge_by_source" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_cust,
        |       CAST(sum(CASE WHEN c_custkey % 2 = 0
        |                     THEN CAST(trunc(c_acctbal * 100) AS BIGINT) + 100000
        |                     ELSE 0 END) AS BIGINT) AS bal_sum
        |FROM customer
        |WHERE c_custkey % 2 = 0
        |   OR (c_custkey % 3 = 0 AND c_nationkey >= 10)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q176_wap_refs" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS k_sum,
        |       CAST(sum(n_regionkey) AS BIGINT) AS rk_sum,
        |       CAST(1 AS BIGINT) AS staged_invisible,
        |       CAST(1 AS BIGINT) AS audit_sees_staged,
        |       CAST(1 AS BIGINT) AS tag_pins_baseline
        |FROM nation""".stripMargin,
    "q175_iceberg_metadata_export" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS k_sum,
        |       CAST(sum(n_regionkey) AS BIGINT) AS rk_sum,
        |       CAST(1 AS BIGINT) AS snapshot_id_ok,
        |       CAST(1 AS BIGINT) AS schema_ids_ok,
        |       CAST(1 AS BIGINT) AS partition_spec_ok,
        |       CAST(1 AS BIGINT) AS file_list_ok
        |FROM nation""".stripMargin,
    "q174_nested_stats_skipping" ->
      """SELECT o_orderstatus AS status,
        |       count(*) AS n_rows,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(min(o_orderkey % 1000) AS BIGINT) AS min_score,
        |       CAST(1 AS BIGINT) AS idx_lane_pruned,
        |       CAST(1 AS BIGINT) AS envelope_lane_pruned,
        |       CAST(1 AS BIGINT) AS nested_agg_not_pushed
        |FROM orders WHERE o_orderkey % 1000 >= 900
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q173_cbo_histograms" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |       count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS estimate_collapsed,
        |       CAST(1 AS BIGINT) AS broadcast_flipped
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderkey % 100 = 0 AND o_orderkey % 500 + 501 > 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q172_column_mapping_id" ->
      """SELECT count(*) + 3 AS n_rows,
        |       CAST(sum(n_nationkey) + 100 + 101 + 102 AS BIGINT) AS k_sum,
        |       CAST(sum(n_regionkey) + (100 % 5) + (101 % 5) + (102 % 5)
        |            AS BIGINT) AS region_sum,
        |       CAST(3 AS BIGINT) AS foreign_rows,
        |       CAST(1 AS BIGINT) AS file_ids_stamped
        |FROM nation""".stripMargin,
    "q171_named_catalog" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS k_sum,
        |       CAST(sum(n_regionkey
        |                 + CASE WHEN n_nationkey % 2 = 0 THEN 10 ELSE 0 END)
        |            AS BIGINT) AS rk_sum,
        |       CAST(1 AS BIGINT) AS renamed_listed,
        |       CAST(1 AS BIGINT) AS time_travel_by_name,
        |       CAST(1 AS BIGINT) AS path_addressing_intact
        |FROM nation WHERE n_nationkey < 20""".stripMargin,
    "q170_bucket_transform_spj" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS spj_join_no_shuffle
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q169_idempotent_txn" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(1 AS BIGINT) AS replays_noop,
        |       CAST(1 AS BIGINT) AS no_orphans
        |FROM orders
        |WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q168_cross_partition_merge" ->
      """WITH tgt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderkey % 5 = 0),
        |src AS (
        |  SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, 'X' AS o_orderstatus
        |  FROM orders
        |  WHERE o_orderkey % 10 = 0 OR (o_orderkey % 5 = 1 AND o_orderkey % 3 = 0)),
        |merged AS (
        |  SELECT t.o_orderkey,
        |         CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey % 20 = 0
        |              THEN s.o_custkey ELSE t.o_custkey END AS o_custkey,
        |         CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey % 20 = 0
        |              THEN s.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |         CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey % 20 <> 0
        |              THEN 1 ELSE 0 END AS del
        |  FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey),
        |final AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus FROM merged WHERE del = 0
        |  UNION ALL
        |  SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus FROM src s
        |  WHERE NOT EXISTS (SELECT 1 FROM tgt t WHERE t.o_orderkey = s.o_orderkey))
        |SELECT o_orderstatus, count(*) AS n_rows,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(1 AS BIGINT) AS moved_rows_landed
        |FROM final GROUP BY 1 ORDER BY 1""".stripMargin,
    "q167_atomic_ctas_rtas" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(1 AS BIGINT) AS atomic_ctas,
        |       CAST(1 AS BIGINT) AS atomic_flip
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q166_hilbert_optimize" ->
      """WITH b AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax FROM lineitem),
        |band AS (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem, b
        |         WHERE l_partkey >= pmin + (pmax - pmin) // 4
        |           AND l_partkey <= pmin + (pmax - pmin) // 2)
        |SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS qty_sum,
        |       CAST(sum(l_orderkey * l_partkey) AS BIGINT) AS key_checksum,
        |       CAST(1 AS BIGINT) AS rewrote_once,
        |       CAST(1 AS BIGINT) AS rerun_skipped,
        |       CAST(1 AS BIGINT) AS hilbert_provenance,
        |       CAST(1 AS BIGINT) AS band_prunes
        |FROM band""".stripMargin,
    "q164_convert_in_place" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_custkey) AS BIGINT) AS cust_sum,
        |       CAST(1 AS BIGINT) AS adopted_in_place,
        |       CAST(1 AS BIGINT) AS v1_time_travel_exact
        |FROM orders
        |WHERE o_orderkey % 3 = 0 AND o_orderkey % 2 <> 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q165_optimized_write" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS one_file_per_partition
        |FROM orders
        |WHERE o_orderkey % 3 = 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q161_copy_into" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS rerun_noop,
        |       CAST(1 AS BIGINT) AS incremental_pickup
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_add_column_default" ->
      """SELECT k, name, bonus,
        |       CAST(1 AS BIGINT) AS pre_add_default,
        |       CAST(1 AS BIGINT) AS narrow_pre_add_schema
        |FROM (
        |  SELECT n_nationkey AS k, n_name AS name, CAST(7 AS BIGINT) AS bonus
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 1000, n_name,
        |         CASE WHEN n_nationkey % 10 = 0 THEN NULL
        |              ELSE CAST(n_nationkey * 10 AS BIGINT) END
        |  FROM nation WHERE n_nationkey % 5 = 0
        |) ORDER BY k""".stripMargin,
    "q154_partition_evolution" ->
      """SELECT lang,
        |       CASE WHEN doc_id % 2 = 1 THEN 1 END AS era,
        |       count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS chars_sum,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(1 AS BIGINT) AS guard_refused,
        |       CAST(1 AS BIGINT) AS new_key_pruned_old_gen
        |FROM documents
        |GROUP BY lang, era ORDER BY lang, era""".stripMargin,
    "q152_protocol_features" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS fresh_table_no_protocol,
        |       CAST(1 AS BIGINT) AS dv_requires_reader_dv,
        |       CAST(1 AS BIGINT) AS future_feature_read_refused,
        |       CAST(1 AS BIGINT) AS future_feature_write_refused
        |FROM nation WHERE n_nationkey % 5 <> 0
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q153_generated_partition_pruning" ->
      """SELECT CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |         AS cents_sum,
        |       CAST(1 AS BIGINT) AS base_filter_pruned_dirs
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-04 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1995-01-07 00:00:00'
        |GROUP BY day ORDER BY day""".stripMargin,
    "q100_sql_update" ->
      """SELECT CASE WHEN o_orderstatus = 'F' THEN 'X-EXPEDITED'
        |            ELSE o_orderpriority END AS o_orderpriority,
        |       count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q101_merge_upsert" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_cust,
        |       CAST(sum(CASE WHEN c_custkey % 2 = 0
        |                     THEN CAST(trunc(c_acctbal * 100) AS BIGINT) + 100000
        |                     ELSE CAST(trunc(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
        |         AS bal_sum
        |FROM customer WHERE c_custkey % 3 = 0 OR c_custkey % 2 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q102_row_delete" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_totalprice >= 100000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q23_pjparquet_agg" ->
      """SELECT l_returnflag, round(sum(l_extendedprice), 2) AS sum_price, count(*) AS cnt
        |FROM lineitem WHERE l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q24_pjparquet_projection" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000.0 ORDER BY o_orderkey""".stripMargin,
    "q25_pjparquet_join" ->
      """SELECT s_nationkey, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q60_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       sum(CAST(o_totalprice AS DECIMAL(18,2))) AS price_sum
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q55_pjparquet_insert" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q62_pjparquet_partitioned_insert" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q64_pjparquet_dynamic_overwrite" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey, count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q129_sql_time_travel" ->
      """SELECT (SELECT count(*) FROM nation) AS v1_rows,
        |       (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS v1_key_sum,
        |       (SELECT count(*) FROM nation WHERE n_regionkey >= 3) AS head_rows,
        |       (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation
        |        WHERE n_regionkey >= 3) AS head_key_sum""".stripMargin,
    "q126_table_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'append', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 'append', CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        |  (CAST(3 AS BIGINT), 'delete-where', CAST(1 AS BIGINT), CAST(1 AS BIGINT)))
        |  AS t(version, action, n_files, ts_nondecreasing)
        |ORDER BY version""".stripMargin,
    "q125_time_travel" ->
      """WITH h AS (SELECT n_nationkey + 100 AS k FROM nation WHERE n_regionkey < 2)
        |SELECT (SELECT count(*) FROM nation) AS v1_rows,
        |       (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation) AS v1_key_sum,
        |       (SELECT count(*) FROM h) AS head_rows,
        |       (SELECT CAST(sum(k) AS BIGINT) FROM h) AS head_key_sum,
        |       CAST(2 AS BIGINT) AS n_versions""".stripMargin,
    "q138_drop_column" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(k) AS BIGINT) AS k_sum,
        |       CAST(2 AS BIGINT) AS n_cols_after_drop,
        |       CAST((SELECT count(DISTINCT n_name) FROM nation) AS BIGINT)
        |         AS v1_distinct_names
        |FROM (
        |  SELECT n_nationkey AS k FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100 FROM nation WHERE n_regionkey = 1)""".stripMargin,
    "q147_table_properties" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(round(c_acctbal * 100)) AS BIGINT) AS cents_sum,
        |       CAST(1 AS BIGINT) AS properties_commit_metadata_only,
        |       CAST(1 AS BIGINT) AS cdc_persisted_by_property,
        |       CAST((SELECT count(*) FROM customer WHERE c_custkey % 5 = 0) AS BIGINT)
        |         AS n_delete_change_rows,
        |       CAST(1 AS BIGINT) AS checkpoint_at_interval,
        |       CAST(1 AS BIGINT) AS typo_refused,
        |       CAST(1 AS BIGINT) AS show_reads_back
        |FROM customer WHERE c_custkey % 5 <> 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q148_shallow_clone" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents_sum,
        |       CAST(0 AS BIGINT) AS files_copied_at_clone,
        |       CAST(2 AS BIGINT) AS cloned_file_refs,
        |       CAST((SELECT count(*) FROM orders) AS BIGINT)
        |         AS source_rows_after_clone_dml
        |FROM orders WHERE o_orderkey % 3 <> 0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q149_analyze_cbo_stats" ->
      """WITH f AS (SELECT c_custkey, c_mktsegment,
        |                  CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |           FROM customer)
        |SELECT * FROM (
        |  SELECT 'c_custkey' AS "column",
        |         CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS null_count,
        |         CAST(8 AS BIGINT) AS avg_len, CAST(8 AS BIGINT) AS max_len,
        |         CAST(min(c_custkey) AS VARCHAR) AS min_s,
        |         CAST(max(c_custkey) AS VARCHAR) AS max_s,
        |         CAST(-1 AS BIGINT) AS ndv_exact,
        |         CAST(1 AS BIGINT) AS ndv_within_5pct,
        |         CAST(1 AS BIGINT) AS cbo_visible,
        |         CAST(count(*) AS BIGINT) AS table_rows
        |  FROM f
        |  UNION ALL
        |  SELECT 'c_mktsegment',
        |         CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(ceil(avg(strlen(c_mktsegment))) AS BIGINT),
        |         CAST(max(strlen(c_mktsegment)) AS BIGINT),
        |         NULL, NULL,
        |         CAST(count(DISTINCT c_mktsegment) AS BIGINT),
        |         CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(count(*) AS BIGINT)
        |  FROM f
        |  UNION ALL
        |  SELECT 'cents',
        |         CAST(sum(CASE WHEN cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(8 AS BIGINT), CAST(8 AS BIGINT),
        |         CAST(min(cents) AS VARCHAR), CAST(max(cents) AS VARCHAR),
        |         CAST(-1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |         CAST(count(*) AS BIGINT)
        |  FROM f
        |) ORDER BY "column"""".stripMargin,
    "q150_create_generated_identity" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum((CAST(round(c_acctbal * 100) AS BIGINT) +
        |                 CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) * 2)
        |            AS BIGINT) AS cents2_sum,
        |       'raw' AS tag_min,
        |       CAST(1 AS BIGINT) AS ids_unique,
        |       CAST(1 AS BIGINT) AS ids_in_progression
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q151_clone_materialize" ->
      """SELECT s_nationkey, count(*) AS n_supp,
        |       CAST(sum(round(s_acctbal * 100)) AS BIGINT) AS cents_sum,
        |       CAST(2 AS BIGINT) AS files_materialized,
        |       CAST(1 AS BIGINT) AS entries_local_no_dv,
        |       CAST(1 AS BIGINT) AS source_deleted_clone_reads
        |FROM supplier WHERE s_suppkey % 7 <> 0
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q146_rename_column" ->
      """SELECT substr(p_type, 1, 6) AS type_prefix, count(*) AS n_parts,
        |       CAST(sum(round(p_retailprice * 100)) AS BIGINT) AS cents_sum,
        |       CAST(sum(p_partkey) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS physically_uniform,
        |       CAST(1 AS BIGINT) AS stale_writer_refused
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q145_check_constraints" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS cents_sum,
        |       CAST(1 AS BIGINT) AS violating_write_refused,
        |       CAST(1 AS BIGINT) AS preexisting_violation_refused,
        |       CAST(1 AS BIGINT) AS constraint_recorded
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q144_merge_evolution" ->
      """WITH t AS (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer WHERE c_custkey % 3 = 0),
        |s AS (
        |  SELECT c_custkey, 2 * CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |         c_mktsegment AS segment
        |  FROM customer WHERE c_custkey % 2 = 0),
        |m AS (
        |  SELECT COALESCE(s.c_custkey, t.c_custkey) AS k,
        |         COALESCE(s.cents, t.cents) AS cents, s.segment
        |  FROM t FULL JOIN s ON t.c_custkey = s.c_custkey)
        |SELECT segment, count(*) AS n_cust,
        |       CAST(sum(cents) AS BIGINT) AS cents_sum,
        |       CAST(sum(k) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS refused_without_clause,
        |       CAST(1 AS BIGINT) AS evolution_commit_recorded
        |FROM m GROUP BY segment ORDER BY segment""".stripMargin,
    "q143_restore" ->
      """SELECT CAST(2 * count(*) AS BIGINT) AS n_rows,
        |       CAST(2 * sum(n_nationkey) + 100 * count(*) AS BIGINT) AS key_sum,
        |       CAST(1 AS BIGINT) AS head_equals_v2,
        |       CAST(1 AS BIGINT) AS restore_committed_v5,
        |       CAST(1 AS BIGINT) AS history_has_restore,
        |       CAST(1 AS BIGINT) AS time_travel_intact
        |FROM nation""".stripMargin,
    "q142_dedup_in_place" ->
      """SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,
        |       CAST(1 AS BIGINT) AS dedup_exact,
        |       CAST(1 AS BIGINT) AS no_file_rewritten,
        |       CAST(1 AS BIGINT) AS removed_matches
        |FROM documents""".stripMargin,
    "q141_mor_update" ->
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |fin AS (
        |  SELECT c_nationkey,
        |         CASE WHEN c_custkey % 7 = 0 THEN 2 * GREATEST(cents, 0)
        |              WHEN cents < 0 THEN 0
        |              ELSE cents END AS cents
        |  FROM base)
        |SELECT c_nationkey,
        |       count(*) AS n_cust,
        |       CAST(sum(cents) AS BIGINT) AS cents_sum,
        |       CAST(sum(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zeroed,
        |       CAST(1 AS BIGINT) AS base_files_kept,
        |       CAST(1 AS BIGINT) AS base_has_vectors
        |FROM fin
        |GROUP BY c_nationkey""".stripMargin,
    "q140_dv_delete" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders)
        |SELECT o_orderstatus,
        |       count(*) AS n_orders,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |       CAST(sum(price_cents) AS BIGINT) AS cents_sum,
        |       CAST(1 AS BIGINT) AS no_file_rewritten,
        |       CAST(1 AS BIGINT) AS two_dv_commits,
        |       CAST(4 AS BIGINT) AS files_with_vectors
        |FROM base
        |WHERE NOT ((o_orderstatus = 'F' AND price_cents < 15000000)
        |           OR o_custkey <= 50)
        |GROUP BY o_orderstatus""".stripMargin,
    "q139_add_column" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(k) AS BIGINT) AS k_sum,
        |       count(tag) AS tag_non_null,
        |       count(DISTINCT tag) AS tag_distinct,
        |       CAST(3 AS BIGINT) AS n_cols
        |FROM (
        |  SELECT n_nationkey AS k, CAST(NULL AS VARCHAR) AS tag FROM nation
        |  UNION ALL
        |  SELECT n_nationkey + 100, n_name FROM nation WHERE n_regionkey = 0
        |  UNION ALL
        |  SELECT n_nationkey + 200, CAST(NULL AS VARCHAR) FROM nation
        |  WHERE n_regionkey = 2)""".stripMargin,
    "q137_sql_maintenance" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |       CAST(3 AS BIGINT) AS small_files,
        |       CAST(1 AS BIGINT) AS compacted_into,
        |       CAST(4 AS BIGINT) AS versions_after_compact,
        |       CAST(3 AS BIGINT) AS versions_dropped,
        |       CAST(1 AS BIGINT) AS versions_kept,
        |       CAST(1 AS BIGINT) AS reclaimed_ge_3,
        |       CAST(1 AS BIGINT) AS vacuum_clean
        |FROM nation WHERE n_regionkey IN (0, 1, 2)""".stripMargin,
    "q136_type_widening" ->
      """WITH widened AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS k FROM nation
        |  UNION ALL
        |  SELECT CAST(n_nationkey AS BIGINT) + 4000000000 FROM nation
        |  WHERE n_regionkey = 2)
        |SELECT count(*) AS n_rows,
        |       CAST(sum(k) AS BIGINT) AS k_sum,
        |       min(k) AS k_min,
        |       max(k) AS k_max,
        |       count(CASE WHEN k > 2000000000 THEN 1 END) AS n_wide,
        |       CAST(1 AS BIGINT) AS schema_widened
        |FROM widened""".stripMargin,
    "q135_cdf_option_read" ->
      """SELECT n_nationkey, n_name, n_regionkey, _change_type, _commit_version
        |FROM (
        |  SELECT n_nationkey, n_name, n_regionkey,
        |         'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
        |  FROM nation
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey,
        |         'delete', CAST(2 AS BIGINT)
        |  FROM nation WHERE n_regionkey = 4
        |  UNION ALL
        |  SELECT n_nationkey, n_name, n_regionkey,
        |         'insert', CAST(3 AS BIGINT)
        |  FROM nation WHERE n_regionkey = 0)
        |ORDER BY _commit_version, _change_type, n_nationkey""".stripMargin,
    "q131_change_feed" ->
      """SELECT n_nationkey, n_name, n_regionkey, _change_type,
        |       CAST(2 AS BIGINT) AS _commit_version
        |FROM (
        |  SELECT n_nationkey, n_name, n_regionkey,
        |         'update_preimage' AS _change_type
        |  FROM nation WHERE n_regionkey = 2
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, n_regionkey,
        |         'update_postimage'
        |  FROM nation WHERE n_regionkey = 2)
        |ORDER BY _change_type, n_nationkey""".stripMargin,
    "q134_streaming_cdf" ->
      """SELECT n_nationkey, n_name, n_regionkey, _change_type,
        |       CAST(2 AS BIGINT) AS _commit_version,
        |       CAST(1 AS BIGINT) AS cdc_persisted
        |FROM (
        |  SELECT n_nationkey, n_name, n_regionkey,
        |         'update_preimage' AS _change_type
        |  FROM nation WHERE n_regionkey = 1
        |  UNION ALL
        |  SELECT CAST(n_nationkey + 100 AS INTEGER), n_name, n_regionkey,
        |         'update_postimage'
        |  FROM nation WHERE n_regionkey = 1)
        |ORDER BY _change_type, n_nationkey""".stripMargin,
    "q132_vacuum_retention" ->
      """SELECT CAST(2 AS BIGINT) AS versions_dropped,
        |       CAST(1 AS BIGINT) AS versions_kept,
        |       CAST(1 AS BIGINT) AS files_reclaimed,
        |       (SELECT count(*) + 2 FROM region) AS head_rows,
        |       (SELECT CAST(sum(r_regionkey) + 50 AS BIGINT) FROM region) +
        |         (SELECT CAST(sum(r_regionkey) AS BIGINT)
        |          FROM region WHERE r_regionkey < 2) AS head_key_sum,
        |       CAST(1 AS BIGINT) AS expired_read_errors_with_range""".stripMargin,
    "q80_pjparquet_zordered_scan" ->
      """WITH rng AS (
        |  SELECT CAST(min(l_orderkey) AS BIGINT) AS o_min, CAST(max(l_orderkey) AS BIGINT) AS o_max,
        |         CAST(min(l_partkey) AS BIGINT) AS p_min, CAST(max(l_partkey) AS BIGINT) AS p_max
        |  FROM lineitem)
        |SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS qty_sum,
        |       CAST(sum(l_orderkey * l_linenumber) AS BIGINT) AS key_checksum,
        |       CAST(1 AS BIGINT) AS bounds_pushed
        |FROM lineitem CROSS JOIN rng
        |WHERE l_orderkey <= o_min + (o_max - o_min) // 4
        |  AND l_partkey >= p_min + (p_max - p_min) // 4
        |  AND l_partkey <= p_min + (p_max - p_min) // 2""".stripMargin,
    "q85_pjparquet_metadata_table" ->
      """SELECT count(*) AS total_rows,
        |       CAST(1 AS BIGINT) AS rgs_positive,
        |       CAST(1 AS BIGINT) AS bytes_ok,
        |       CAST(1 AS BIGINT) AS one_file
        |FROM lineitem""".stripMargin,
    "q93_count_pushdown" ->
      """SELECT count(*) AS n_rows,
        |       min(l_orderkey) AS min_okey, max(l_orderkey) AS max_okey,
        |       CAST(min(l_linenumber) AS INTEGER) AS min_line,
        |       CAST(max(l_linenumber) AS INTEGER) AS max_line,
        |       count(l_returnflag) AS n_flags,
        |       (SELECT count(*) FROM lineitem WHERE l_quantity > 25.0) AS n_big,
        |       CAST(1 AS BIGINT) AS metadata_only,
        |       CAST(1 AS BIGINT) AS filtered_scans_data
        |FROM lineitem""".stripMargin,
    "q95_grouped_count_pushdown" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc,
        |       CAST(max(doc_id) AS BIGINT) AS max_doc,
        |       CAST(1 AS BIGINT) AS metadata_only
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q94_schema_evolution" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |       count(CASE WHEN n_nationkey >= 12 THEN 1 END) AS evolved_rows,
        |       CAST(sum(CASE WHEN n_nationkey >= 12 THEN length(n_name) ELSE 0 END) AS BIGINT)
        |         AS evolved_sum,
        |       CAST(sum(CASE WHEN n_nationkey < 12 THEN n_regionkey END) AS BIGINT)
        |         AS legacy_region_sum
        |FROM nation""".stripMargin,
    "q97_limit_pushdown" ->
      """SELECT count(*) AS n_limited, CAST(1 AS BIGINT) AS limit_pushed
        |FROM (SELECT * FROM orders LIMIT 500)""".stripMargin,
    "q99_partition_delete" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
        |       count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation WHERE n_regionkey <> 0
        |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q110_filtered_count_pushdown" ->
      """SELECT count(*) AS n_docs,
        |       CAST(min(doc_id) AS BIGINT) AS min_doc,
        |       CAST(max(doc_id) AS BIGINT) AS max_doc,
        |       CAST(1 AS BIGINT) AS metadata_only
        |FROM documents WHERE lang IN ('en', 'de')""".stripMargin,
    "q112_typed_minmax_pushdown" ->
      """SELECT count(*) AS n_rows,
        |       CAST(min(l_shipdate) AS VARCHAR) AS min_ship,
        |       CAST(max(l_shipdate) AS VARCHAR) AS max_ship,
        |       min(l_returnflag) AS min_flag,
        |       max(l_linestatus) AS max_status,
        |       round(min(l_quantity), 2) AS min_qty,
        |       round(max(l_quantity), 2) AS max_qty,
        |       min(l_discount) AS min_disc,
        |       CAST(1 AS BIGINT) AS metadata_only,
        |       CAST(1 AS BIGINT) AS zero_bound_scans_data
        |FROM lineitem""".stripMargin,
    "q115_topn_pushdown" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(l_orderkey) AS BIGINT) AS okey_sum,
        |       CAST(sum(l_linenumber) AS BIGINT) AS line_sum,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(max(l_orderkey) AS BIGINT) AS max_okey,
        |       CAST(1 AS BIGINT) AS topn_pushed
        |FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100)""".stripMargin,
    "q114_pq_persisted_index" ->
      """SELECT count(*) AS probes_returned,
        |       CAST(1 AS BIGINT) AS per_probe_shape_ok,
        |       CAST(1 AS BIGINT) AS codes_scanned_not_encoded,
        |       CAST(1 AS BIGINT) AS artifact_persisted,
        |       CAST(1 AS BIGINT) AS recall_ge_80
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "q116_ivfpq_ann" ->
      """SELECT count(*) AS probes_returned,
        |       CAST(1 AS BIGINT) AS per_probe_shape_ok,
        |       CAST(1 AS BIGINT) AS lists_pruned_at_planning,
        |       CAST(1 AS BIGINT) AS recall_ge_60
        |FROM embeddings WHERE vec_id < 10""".stripMargin,
    "q113_sorted_layout" ->
      """SELECT CAST(l_orderkey % 10 AS BIGINT) AS okey_mod,
        |       count(*) AS n_items,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       CAST(sum(l_partkey) AS BIGINT) AS part_sum,
        |       CAST(1 AS BIGINT) AS sort_elided
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q111_nested_pjparquet" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(1 AS BIGINT) AS nested_spliced_planned,
        |       CAST(1 AS BIGINT) AS nested_subtree_pruned,
        |       CAST(1 AS BIGINT) AS flat_index_planned
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q108_spj_join" ->
      """WITH t AS (SELECT lang, count(*) AS lang_total FROM documents GROUP BY lang)
        |SELECT d.lang, count(*) AS n_docs,
        |       CAST(sum(d.doc_id) AS BIGINT) AS id_sum,
        |       CAST(max(t.lang_total) AS BIGINT) AS lang_total,
        |       CAST(1 AS BIGINT) AS spj_no_shuffle
        |FROM documents d JOIN t USING(lang)
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q103_bloom_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |       round(o_totalprice, 2) AS price,
        |       CAST(1 AS BIGINT) AS bloom_pruned
        |FROM orders WHERE o_orderkey = 7""".stripMargin,
    "q98_runtime_pruned_join" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS doc_sum,
        |       CAST(1 AS BIGINT) AS runtime_pruned
        |FROM documents WHERE lang IN ('de', 'fr')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q96_streaming_ingest" ->
      """SELECT c_mktsegment, count(*) AS n_cust,
        |       CAST(sum(c_custkey) AS BIGINT) AS key_sum,
        |       CAST(sum(c_nationkey) AS BIGINT) AS nation_sum
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q92_vacuum" ->
      """SELECT count(*) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS doc_checksum,
        |       CAST(1 AS BIGINT) AS orphan_collected,
        |       CAST(1 AS BIGINT) AS workdir_collected,
        |       CAST(1 AS BIGINT) AS live_sidecars_intact
        |FROM documents""".stripMargin,
    "q122_optimize_zorder" ->
      """WITH b AS (SELECT min(l_partkey) AS pmin, max(l_partkey) AS pmax FROM lineitem),
        |band AS (SELECT l_orderkey, l_partkey, l_quantity FROM lineitem, b
        |         WHERE l_partkey >= pmin + (pmax - pmin) // 4
        |           AND l_partkey <= pmin + (pmax - pmin) // 2)
        |SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS qty_sum,
        |       CAST(sum(l_orderkey * l_partkey) AS BIGINT) AS key_checksum,
        |       CAST(1 AS BIGINT) AS optimized_prunes,
        |       CAST(1 AS BIGINT) AS improved_vs_ingest_order,
        |       CAST(1 AS BIGINT) AS sort_marker_dropped,
        |       CAST(1 AS BIGINT) AS sidecars_track_files
        |FROM band""".stripMargin,
    "q89_compaction" ->
      """SELECT count(*) AS n_docs,
        |       CAST(sum(doc_id) AS BIGINT) AS doc_checksum,
        |       CAST(sum(len(text)) AS BIGINT) AS text_len,
        |       count(DISTINCT lang) AS langs,
        |       CAST(1 AS BIGINT) AS consumed_all_small,
        |       CAST(1 AS BIGINT) AS one_file_per_partition,
        |       CAST(1 AS BIGINT) AS files_reduced
        |FROM documents""".stripMargin)
}
