package graft.sources.pjparquet

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queryable metadata table — the library's `parquet_metadata()`: one row
  * per (file, row_group) with the row count and EXACT compressed byte
  * size, served from the PJ index layer (sidecars when present, a single
  * driver-side footer walk to build an in-memory index otherwise —
  * never a full Thrift parse per query). Reference analogue: the
  * row-group/column counts PalletJack exposes through its index header
  * (`palletjack.cc:432-444`), lifted into a DataFrame so layout health
  * (row-group sizing, small-file detection, compaction planning) is
  * answerable in SQL.
  *
  * Driver-side by design: the output is metadata-sized (one row per row
  * group, not per data row), and resolution rides the same layout cache
  * as the scan path, so repeated calls stat-check instead of re-reading.
  */
object PjMetadata {

  def rowGroups(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val layout = PjParquetTable.resolveFiles(path, conf, autogen = true)
    layout.files.flatMap { f =>
      val idx = graft.core.PJSplice.Index.fromBytes(f.indexBytes)
      val cols = idx.header.columns
      val name = f.path.substring(f.path.lastIndexOf('/') + 1)
      (0 until idx.header.rowGroups).map { rg =>
        val sizes = (0 until cols).map(c => idx.chunkCompressedSize(rg, c))
        val bytes = if (sizes.contains(-1L)) -1L else sizes.sum
        (name, rg, idx.rowNumber(rg), bytes)
      }
    }.toDF("file", "row_group", "num_rows", "compressed_bytes")
  }

  /** DESCRIBE HISTORY as a DataFrame — one row per retained commit-log
    * version of a logged table: (version, ts, action, n_files). Metadata
    * rate (one log read per version, no data I/O); errors on unlogged
    * tables, matching [[PjVacuum.expireVersions]].
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!PjCommitLog.isEnabled(fs, root))
      throw new graft.core.PJException(
        s"pjparquet: '$path' has no commit log; history applies to logged tables")
    PjCommitLog.history(fs, root)
      .map(s => (s.version, new java.sql.Timestamp(s.ts), s.action, s.nFiles))
      .toDF("version", "ts", "action", "n_files")
  }
}
