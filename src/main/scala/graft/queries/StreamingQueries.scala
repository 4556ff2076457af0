package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream

/** Streaming operators on the CORRECTNESS path (§2.9 extension): the
  * events table replayed through `readStream` + `Trigger.AvailableNow`,
  * sunk to parquet via `foreachBatch`, read back, and hash-compared
  * against a plain batch-SQL oracle — the same windowed aggregation the
  * batch path runs, so stream/batch equivalence is checked by the DuckDB
  * gate rather than only by the unit spec.
  */
object StreamingQueries {

  /** applicationId-scoped: two JVMs on one host (Bench ∥ Verify in CI)
    * must not share source/checkpoint/output directories — interleaved
    * checkpoints corrupt both runs. */
  private def tmp(s: org.apache.spark.sql.SparkSession, name: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_${name}_${s.sparkContext.applicationId}").toString

  private def rmrf(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles).iterator.flatten.foreach(rec)
      f.delete(); ()
    }
    rec(new java.io.File(path))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Windowed event-type counts, executed AS A STREAM: the fixture file
    // arrives through the file source, the watermarked tumbling-window
    // aggregation runs in complete mode (every window in the final
    // epoch's state — append mode would hold back windows the
    // end-of-stream watermark never closes), and foreachBatch overwrites
    // the parquet sink per epoch so the LAST epoch is what gets read
    // back. The double sum rounds to 2dp for hash stability (partition
    // merge order), same convention as the batch rollups.
    "st_window_counts" -> ((s, d) => {
      // same nanos-as-long handling as Tables.events, but the stream
      // needs the RAW schema up front (readStream requires one)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$d/events.parquet"
      val rawSchema = s.read.parquet(path).schema
      // the file stream source monitors DIRECTORIES; the fixture is a
      // single parquet file, so stage it into one (the "files landing in
      // a drop directory" shape a streaming ingest actually has)
      val srcDir = tmp(s, "win_src")
      rmrf(srcDir)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(path),
        java.nio.file.Paths.get(srcDir, "events.parquet"))
      val stream = s.readStream.schema(rawSchema).parquet(srcDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val outDir = tmp(s, "win_out")
      val ckDir = tmp(s, "win_ck")
      rmrf(ckDir) // fresh checkpoint: each invocation reprocesses the file
      val q = EventStream.windowedTypeCounts(stream, "10 minutes", "1 hour")
        .writeStream
        .outputMode("complete")
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("overwrite").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .select(
          date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Watermark-bounded streaming dedup under AT-LEAST-ONCE delivery: the
    // events file lands in the drop directory TWICE (a re-delivered
    // ingest batch), dropDuplicatesWithinWatermark(event_id) collapses
    // the duplicates with state bounded by the watermark horizon, and
    // the read-back aggregates to per-type totals. Whether AvailableNow
    // takes both files in one micro-batch (in-batch dedup) or two (the
    // second copy is all-late and dropped by the advanced watermark),
    // the sink converges to exactly one row per event — which is what
    // the batch oracle asserts.
    "st_dedup" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val path = s"$d/events.parquet"
      val rawSchema = s.read.parquet(path).schema
      val srcDir = tmp(s, "dedup_src")
      rmrf(srcDir)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
      Seq("events_a.parquet", "events_b.parquet").foreach { f =>
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(path),
          java.nio.file.Paths.get(srcDir, f))
      }
      val stream = s.readStream.schema(rawSchema).parquet(srcDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val outDir = tmp(s, "dedup_out")
      val ckDir = tmp(s, "dedup_ck")
      rmrf(ckDir)
      rmrf(outDir)
      val q = EventStream.dedupWithinWatermark(stream, "10 minutes")
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir); ()
        }
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy("event_type")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // the tumbling 1-hour window is epoch-aligned = date_trunc('hour')
    "st_window_counts" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"),
    // duplicates collapsed ⇒ the totals equal plain batch totals over the
    // ONE copy of the events table
    "st_dedup" ->
      ("SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY event_type")
  )
}
