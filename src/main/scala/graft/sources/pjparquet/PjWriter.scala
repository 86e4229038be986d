package graft.sources.pjparquet

import org.apache.spark.sql.DataFrame

/** Write-side index lifecycle (SURVEY.md §7 step 4): write parquet, then
  * build `.index` sidecars for every emitted file, executor-parallel. New
  * data is immediately readable through `pjparquet` (and eligible for the
  * auto-substitution rule) with zero additional footer parses downstream.
  */
object PjWriter {

  /** `df.write.parquet(path)` + sidecar generation (recursive, so Hive
    * `partitionBy` layouts are fully indexed). Returns sidecars written.
    */
  def writeWithIndex(
      df: DataFrame,
      path: String,
      mode: String = "overwrite",
      options: Map[String, String] = Map.empty,
      partitionBy: Seq[String] = Nil): Long = {
    val w = df.write.mode(mode).options(options)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    PjIndexJob.generateAll(df.sparkSession, path)
  }
}
