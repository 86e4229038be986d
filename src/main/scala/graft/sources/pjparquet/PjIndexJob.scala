package graft.sources.pjparquet

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

import graft.core.PJIndex

/** Fleet-scale index lifecycle (SURVEY.md §7 step 4): build `.index`
  * sidecars for every parquet file under a directory, executor-parallel —
  * the Spark analogue of running O2 per file, with the per-file work pushed
  * off the driver (the reference's GIL-release parallelism,
  * `palletjack_cython.pyx:18-23`, maps to executor tasks here).
  */
object PjIndexJob {

  /** Returns the number of sidecars written. Skips files whose sidecar is
    * already newer than the data file; `overwrite=true` forces regeneration.
    */
  def generateAll(spark: SparkSession, dir: String, overwrite: Boolean = false): Long = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    // recursive: covers Hive-partitioned key=value layouts too
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        buf += ((s.getPath.toString, s.getModificationTime))
    }
    val files = buf.toSeq
    if (files.isEmpty) return 0L
    spark.sparkContext
      .parallelize(files, math.min(files.size, 1024))
      .map { case (pathStr, dataMtime) =>
        val path = new Path(pathStr)
        val pfs = path.getFileSystem(conf.value)
        // hidden dot-file: invisible to stock Spark directory listings
        val indexPath = PjParquetTable.hiddenSidecar(path)
        val fresh = !overwrite && pfs.exists(indexPath) &&
          pfs.getFileStatus(indexPath).getModificationTime >= dataMtime
        if (fresh) 0L else buildOne(conf.value, pathStr)
      }
      .sum().toLong
  }

  /** Build `.index` sidecars for an EXPLICIT file list — the write-commit
    * path: the commit manifest is the exact new-file set, so index
    * maintenance is sized to the commit instead of re-walking (and
    * re-statting) the whole table root per commit/epoch. No freshness probe:
    * new files never have one.
    */
  def generateForPaths(spark: SparkSession, paths: Seq[String]): Long = {
    if (paths.isEmpty) return 0L
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    spark.sparkContext
      .parallelize(paths, math.min(paths.size, 1024))
      .map(pathStr => buildOne(conf.value, pathStr))
      .sum().toLong
  }

  private def buildOne(conf: org.apache.hadoop.conf.Configuration, pathStr: String): Long = {
    val path = new Path(pathStr)
    val pfs = path.getFileSystem(conf)
    val indexPath = PjParquetTable.hiddenSidecar(path)
    val status = pfs.getFileStatus(path)
    val footerBytes = HadoopFooter.readFooterBytes(pfs, status)
    try {
      val bytes = PJIndex.generateFromFooter(footerBytes, pathStr)
      val out = pfs.create(indexPath, true)
      try out.write(bytes) finally out.close()
      1L
    } catch {
      // zero-row-group files are legal parquet (Spark writes one for
      // an empty partition) but un-indexable by design
      // (`palletjack.cc:241-246`): skip them, never fail the fleet
      case e: graft.core.PJException
          if e.getMessage == "Number of row groups is not set!" => 0L
      // nested schemas are un-indexable by design too (reference
      // restriction); reads plan them from their own footer
      case _: graft.core.PJException
          if PJIndex.footerHasNestedSchema(footerBytes) => 0L
    }
  }
}
