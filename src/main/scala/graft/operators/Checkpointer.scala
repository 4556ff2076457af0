package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Injectable lineage-truncation strategy for the iterative operators
  * (connected components, PageRank, BFS, SSSP). They must cut the plan
  * every round — otherwise round N embeds N copies of the edge
  * derivation — but HOW to cut is a deployment decision, not an
  * operator decision:
  *
  *  - default: `localCheckpoint` — blocks live on executors, zero
  *    external storage, the right call at local[32] and for restartable
  *    jobs. The known cost: on a real cluster an executor loss kills its
  *    blocks and the job, because truncated lineage cannot recompute.
  *  - `spark.graft.checkpointDir=<dir>` (or an explicit per-call dir):
  *    reliable `checkpoint` to HDFS/object storage — an executor loss
  *    mid-iteration recovers from the checkpoint files instead of
  *    killing the job. Always EAGER in this mode, with the frame
  *    persisted around the write: a lazy reliable checkpoint recomputes
  *    the whole step from lineage inside the checkpoint-write job, so
  *    every iteration would pay 2x its compute. The scratch blocks drop
  *    immediately after the write (the files carry the data from there).
  *
  * Checkpoint FILES are not scratch and are not touched by
  * [[Dedup.releaseScratch]]; reclaiming them across jobs is the
  * deployment's retention policy (Spark's own
  * `spark.cleaner.referenceTracking.cleanCheckpoints` handles the
  * in-session case). */
object Checkpointer {

  /** Session conf key selecting the reliable strategy. */
  val DirKey = "spark.graft.checkpointDir"

  /** Drop the storage blocks backing a frame [[truncate]] returned, once
    * the OPERATOR knows nothing references them any more (an iterative
    * loop releasing round N's checkpoint after round N+1 materialized).
    * The truncated frame wraps a `LogicalRDD`; unpersisting that RDD
    * frees its localCheckpoint blocks. Reliable-mode frames read
    * checkpoint FILES (their RDD holds no blocks), so this is a no-op
    * there — file retention stays the deployment's policy. Safe to call
    * on any frame: non-LogicalRDD plans are left untouched. */
  def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case _ => ()
    } catch { case _: Throwable => () /* stopped session: nothing to free */ }

  /** Truncate `df`'s lineage under the configured strategy. `eager`
    * only applies to the local strategy (reliable is always eager — see
    * the class note); `dir` overrides the session conf for one call. */
  def truncate(df: DataFrame, eager: Boolean = true,
      dir: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    val target = dir.orElse(
      try spark.conf.getOption(DirKey) catch { case _: Throwable => None })
      .filter(_.trim.nonEmpty)
    target match {
      case None => df.localCheckpoint(eager)
      case Some(d) =>
        val sc = spark.sparkContext
        // setCheckpointDir mints a fresh UUID subdir per call; only
        // (re)set when the configured root actually changed
        if (!sc.getCheckpointDir.exists(_.contains(d))) sc.setCheckpointDir(d)
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        val ck = cached.checkpoint(true)
        cached.unpersist(false)
        ck
    }
  }
}
