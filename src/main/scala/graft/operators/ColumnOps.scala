package graft.operators

import org.apache.spark.sql.DataFrame

/** Config-driven column plumbing: validated bulk rename and header
  * normalization, the P6/P7/P8 operators of SURVEY.md §2.2.
  */
object ColumnOps {

  /** Max length for a renamed column (ref extract_alchemer_data.py:39-41). */
  val MaxColumnNameLength = 150

  /** Mojibake repairs applied to header names
    * (ref utils.py:146-152, transform_alchemer_data.py:13-14). */
  val MojibakeRepairs: Seq[(String, String)] =
    Seq("â€™" -> "'", "Ã" -> "i")

  /** Fail-fast rename validation (ref extract_alchemer_data.py:35-41):
    * every configured source column must exist, every target must fit the
    * length cap. Throws IllegalArgumentException naming all offenders. */
  def validateRenames(
      columns: Seq[String],
      renames: Map[String, String],
      maxLen: Int = MaxColumnNameLength): Unit = {
    val colSet = columns.toSet
    val missing = renames.keys.filterNot(colSet.contains).toSeq.sorted
    val tooLong = renames.values.filter(_.length > maxLen).toSeq.sorted
    if (missing.nonEmpty || tooLong.nonEmpty) {
      val msgs = Seq(
        if (missing.nonEmpty) Some(s"missing source columns: ${missing.mkString(", ")}") else None,
        if (tooLong.nonEmpty) Some(s"targets over $maxLen chars: ${tooLong.mkString(", ")}") else None
      ).flatten
      throw new IllegalArgumentException(s"invalid renames — ${msgs.mkString("; ")}")
    }
  }

  /** Validated bulk rename (P6+P7). */
  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame = {
    validateRenames(df.columns.toSeq, renames)
    df.withColumnsRenamed(renames)
  }

  /** Header normalization (P8): strip surrounding whitespace and repair
    * mojibake in column NAMES (ref extract_alchemer_data.py:30). */
  def normalizeHeaders(df: DataFrame): DataFrame = {
    val renames = df.columns.map { c =>
      c -> MojibakeRepairs.foldLeft(c.trim) {
        case (acc, (from, to)) => acc.replace(from, to)
      }
    }.filter { case (a, b) => a != b }.toMap
    if (renames.isEmpty) df else df.withColumnsRenamed(renames)
  }
}
