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

  // ---- Special-character column names (ref utils.py:139) -----------------
  // The reference's entire reason for `delta.columnMapping.mode=name` is
  // persisting survey columns like `Race/Ethnicity`, `Survey Completed?`,
  // `% of Survey Responses` (ref merge_census.py:98-100) that parquet/
  // metastore field-name rules reject. The parquet-native equivalent is a
  // REVERSIBLE name mapping applied at the sink boundary: every char
  // outside [A-Za-z0-9] — including `_`, so the escape marker `_u` can
  // never collide with an original sequence — encodes as `_uHHHH` (UTF-16
  // code unit, lowercase hex). No sidecar file: the mapping is a pure
  // function of the stored name, so any reader restores verbatim names
  // from the table alone.

  private val SafeChars: Set[Char] =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).toSet

  def escapeColName(name: String): String =
    name.flatMap(c => if (SafeChars(c)) c.toString else f"_u${c.toInt}%04x")

  def restoreColName(name: String): String = {
    val m = java.util.regex.Pattern.compile("_u([0-9a-f]{4})").matcher(name)
    val sb = new StringBuffer
    while (m.find())
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        Integer.parseInt(m.group(1), 16).toChar.toString))
    m.appendTail(sb).toString
  }

  /** [[writeTable]] with verbatim column names escaped to storage-safe
    * form. Pair with [[readTableRestored]]. */
  def writeTableEscaped(df: DataFrame, table: String,
      mode: String = "overwrite"): Boolean =
    writeTable(df.toDF(df.columns.map(escapeColName).toIndexedSeq: _*),
      table, mode)

  /** Read a table written by [[writeTableEscaped]], restoring the
    * verbatim (special-character) column names. */
  def readTableRestored(
      spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    t.toDF(t.columns.map(restoreColName).toIndexedSeq: _*)
  }

  /** Drop a table from the catalog AND purge its warehouse directory —
    * `DROP TABLE ... PURGE` semantics for the in-memory catalog. A fresh
    * session's catalog doesn't know about a previous run's managed-table
    * directory, so a bare `saveAsTable` would fail
    * LOCATION_ALREADY_EXISTS (which [[writeTable]] then swallows, per
    * reference semantics); purging the stale location first is the
    * recovery every cross-session writer needs (spec'd in
    * `TableSinkSpec`). */
  def dropPurge(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }

  /** Overwrite with Delta-style reader isolation, parquet-native: the
    * ref's `delta.columnMapping.mode=name` table (utils.py:139) gives
    * ACID overwrite-while-read, which plain parquet `overwrite` lacks —
    * a reader mid-scan can see the directory being rewritten under it.
    * The standard parquet-native repair is write-new-then-swap: each
    * overwrite lands in a FRESH versioned directory (`v1`, `v2`, …), and
    * the catalog name repoints via `CREATE OR REPLACE VIEW` — a single
    * metastore operation, so a reader either resolves the old version's
    * path (whose files are never mutated) or the new one, never a
    * half-rewritten directory. Old versions stay on disk for in-flight
    * readers / time travel until `keepVersions` prunes them (only
    * versions older than the previous one are ever deleted — the
    * previous version may still be mid-scan).
    * Returns the version number written. */
  def overwriteViaSwap(
      df: DataFrame, table: String, baseDir: String,
      keepVersions: Int = 2): Long = {
    val spark = df.sparkSession
    val dir = new java.io.File(baseDir, table)
    dir.mkdirs()
    def versions: Seq[Long] = Option(dir.listFiles).iterator.flatten
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName.drop(1).toLong).toSeq.sorted
    val next = versions.lastOption.getOrElse(0L) + 1
    val path = new java.io.File(dir, s"v$next").toString
    df.write.mode("overwrite").parquet(path)
    // the swap: one catalog statement; old version files are untouched
    spark.sql(
      s"CREATE OR REPLACE VIEW `$table` AS SELECT * FROM parquet.`$path`")
    // `versions` re-lists AFTER the write, so it already includes v`next`:
    // dropping keepVersions from the right keeps the new version plus the
    // keepVersions-1 most recent old ones (the documented contract — the
    // immediately-previous version may still be mid-scan and must survive)
    versions.dropRight(keepVersions).filter(_ < next).foreach { v =>
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles).iterator.flatten.foreach(rec)
        f.delete(); ()
      }
      rec(new java.io.File(dir, s"v$v"))
    }
    next
  }
}
