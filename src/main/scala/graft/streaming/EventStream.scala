package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension over the `events` stream shape
  * (TESTDATA.md): event-time windowed aggregation with watermarking, and
  * custom per-key state via mapGroupsWithState.
  *
  * The reference pipeline is batch-only (SURVEY.md §2.9) — these operators
  * are the streaming growth path the fixtures leave room for: the same
  * transforms run identically on `readStream` sources at cluster scale,
  * with state bounded by the watermark.
  */
object EventStream {

  /** Tumbling-window counts + value sums per event type. Late events
    * beyond the watermark are dropped; state is bounded accordingly.
    * Sums are integer CENTS (per-row round(value*100) then an exact
    * long sum): integer addition is associative, so the result is
    * bit-identical across micro-batch slicing, partition order, and
    * engines — a double sum behind a 2 dp output round was the one
    * aggregation on the gate whose reassociation error could, at scale,
    * drift past the rounding mask. Same discipline as the ts_ and w
    * batch rollups and st_enrich / st_resume. */
  def windowedTypeCounts(
      events: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_cents"))

  case class UserActivity(user_id: Long, n_events: Long, max_value: Double)

  /** Running per-user activity via explicit mapGroupsWithState state. A
    * production sessionizer would add an event-time timeout keyed to the
    * watermark so abandoned keys expire; a processing-time timeout is
    * deliberately NOT used — it keeps the trigger loop firing empty
    * batches, which also makes tests' processAllAvailable never settle. */
  def runningUserActivity(
      events: Dataset[(Long, Double)]): Dataset[UserActivity] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[(Long, Double)],
         state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(user, 0L, Double.MinValue))
          val (n, mx) = batch.foldLeft((prev.n_events, prev.max_value)) {
            case ((c, m), (_, v)) => (c + 1, math.max(m, v))
          }
          val next = UserActivity(user, n, mx)
          state.update(next)
          next
      }
  }

  /** Streaming ingest dedup: drop events whose `event_id` was already seen
    * within the watermark horizon. This is the streaming face of the batch
    * exact-dedup operators (graft.operators.Dedup): at-least-once sources
    * (Kafka replays, retried micro-batches) re-emit rows, and
    * `dropDuplicatesWithinWatermark` suppresses them with state BOUNDED by
    * the watermark — the unbounded-state `dropDuplicates` would OOM on an
    * infinite stream. Exactly the pattern a streaming training-data
    * ingest needs in front of the batch near-dup stages. */
  def dedupWithinWatermark(
      events: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Event-time session windows: the streaming face of the batch gap
    * sessionizer (graft.operators.TimeSeries.sessionize), on the native
    * `session_window` grouping — sessions merge as events arrive and
    * CLOSE when the watermark passes last-event + gap, so state per key
    * is bounded by the watermark horizon, not the stream length. The
    * same expression runs in batch mode (the spec's equivalence anchor). */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_cents"))

  /** Streaming document curation: the SAME narrow column expressions the
    * batch curation queries use — deterministic hash sampling, token
    * gate, PII redaction (graft.operators.Sampling / TextOps). All
    * stateless, so they run unchanged on an unbounded `readStream` with
    * no watermark and no state store, and a doc admitted by the stream is
    * exactly the doc the batch pipeline would admit (hash sampling has no
    * RNG, so stream vs batch membership is identical — the spec pins the
    * equivalence). This is the Spark-first payoff: one curation codebase,
    * two execution modes. */
  def curateDocStream(docs: DataFrame, sampleRate: Double = 0.5): DataFrame = {
    import graft.operators.{Sampling, TextOps}
    Sampling.bernoulli(docs, "doc_id", sampleRate)
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= 5)
      .select(col("doc_id"), col("n_tokens"),
        TextOps.piiRedact(col("text")).as("redacted"))
  }

  /** Watermarked stream-stream join: match each purchase to the same
    * user's views within the trailing `joinWindow`. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * each side's buffered state expires once the other side's watermark
    * passes the window — bounded state on an unbounded pair of streams,
    * the thing an unconstrained stream join can't give you. */
  def joinWithinWindow(
      purchases: DataFrame, views: DataFrame,
      watermarkDelay: String = "10 minutes",
      joinWindow: String = "30 minutes"): DataFrame = {
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    val v = views.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
    p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr(s"INTERVAL $joinWindow") &&
        col("v_ts") <= col("p_ts"))
      .select("user_id", "p_ts", "p_value", "v_ts", "v_value")
  }

  /** Stream → catalog table: the reference's table-sink pattern
    * (utils.py write_to_delta) with a streaming face — each micro-batch
    * appends through the same TableSink the batch pipeline uses. One
    * deliberate divergence from the batch sink: the batch pipeline
    * prefers partial progress (swallow-and-report), but a streaming sink
    * MUST fail the query on a failed write — otherwise the epoch commits
    * to the checkpoint and the batch's rows are silently lost forever.
    * Throwing makes Structured Streaming replay the batch on restart.
    * Returns the started query (caller owns its lifecycle). */
  def sinkToTable(stream: DataFrame, table: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        if (!graft.sources.TableSink.writeTable(batch, table, mode = "append"))
          throw new IllegalStateException(
            s"sinkToTable: append of epoch $epoch to $table failed — " +
              "failing the query so the checkpoint replays it")
        ()
      }
      .start()

  /** Batch-mode equivalence anchor: the windowed aggregation above, run on
    * a static frame, must equal this (used by the spec as the oracle). */
  def windowedTypeCountsBatch(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_cents"))
}
