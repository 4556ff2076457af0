package graft.sources

import org.apache.spark.sql.DataFrame

/** Catalog table sink with the reference's semantics (ref utils.py:124-142):
  * overwrite-mode saveAsTable with schema overwrite, and write failures
  * swallowed with a diagnostic instead of propagating — the pipeline
  * prefers partial progress over aborting the workflow run.
  */
object TableSink {

  /** Returns true when the write succeeded. */
  def writeTable(df: DataFrame, table: String, mode: String = "overwrite"): Boolean =
    try {
      df.write.mode(mode).option("overwriteSchema", "true").saveAsTable(table)
      true
    } catch {
      case e: Exception =>
        // ref utils.py:141-142: print-and-continue
        System.err.println(s"[TableSink] $mode of $table failed: ${e.getMessage}")
        false
    }
}
