package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.ColumnOps

/** Bronze ingest (ref extract_alchemer_data.py:8-58): merge the online and
  * offline survey extracts, normalize headers, validate + apply renames.
  *
  * The reference outer-merges on ALL shared columns after prefixing
  * offline response IDs with "Offline #" — keys never collide, so the
  * observable result is a union-by-common-columns with nulls in each
  * side's exclusive columns (SURVEY.md §2.3 J1). The Spark-first form is
  * unionByName(allowMissingColumns = true): same rows, ZERO shuffle,
  * where a join would shuffle both sides at scale.
  */
object Bronze {

  def ingest(online: DataFrame, offline: DataFrame, cfg: SurveyConfig): DataFrame = {
    // "Offline #" id prefix (ref extract_alchemer_data.py:14)
    val offlinePrefixed =
      if (offline.columns.contains("Response ID"))
        offline.withColumn("Response ID",
          concat(lit("Offline #"), col("Response ID").cast("string")))
      else offline
    // shared merge keys are cast to string on both sides
    // (ref extract_alchemer_data.py:19-21)
    val shared = online.columns.toSet.intersect(offlinePrefixed.columns.toSet)
    def stringify(df: DataFrame): DataFrame =
      df.select(df.columns.map { c =>
        if (shared.contains(c)) col(c).cast("string").as(c) else col(c)
      }.toSeq: _*)
    val merged = stringify(online)
      .unionByName(stringify(offlinePrefixed), allowMissingColumns = true)
    // header strip (ref extract_alchemer_data.py:30), then validated rename
    // (ref extract_alchemer_data.py:35-46)
    val normalized = ColumnOps.normalizeHeaders(merged)
    ColumnOps.renameAll(normalized, cfg.colsToRename)
  }
}
