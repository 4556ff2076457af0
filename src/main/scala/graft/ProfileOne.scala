package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB wall/metric profile of ONE query from `SparkEntry.queries` —
  * the measurement step the optimization guide (§1, §7.1) starts from,
  * usable headless (the bench host runs with the UI disabled). Runs the
  * query once unrecorded (JIT + codegen), then once instrumented with a
  * SparkListener, and prints one line per job: wall seconds, task count,
  * summed executor run/CPU time, shuffle read/write bytes, spill. The
  * gap between the query's wall time and the summed job walls is
  * driver-side work (planning, file listing, collect-side artifacts).
  *
  * Usage: runMain graft.ProfileOne <query> — honours SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS like Bench/BenchOne.
  */
object ProfileOne {
  private final class JobAgg {
    var start = 0L; var end = 0L
    var tasks = 0; var runMs = 0L; var cpuNs = 0L
    var shRead = 0L; var shWrite = 0L; var spill = 0L
    var input = 0L
    var desc = ""
    val stages = mutable.Set.empty[Int]
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileOne <query>")
    val name = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    fn(spark, sfDir).count() // warm-up, unrecorded
    graft.operators.Dedup.releaseAllCaches(spark)

    val jobs = mutable.LinkedHashMap.empty[Int, JobAgg]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val a = new JobAgg
        a.start = e.time
        a.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          // fall back to the result stage's callsite name — identifies
          // which action (count/collect/broadcast/checkpoint) ran the job
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs.synchronized { jobs(e.jobId) = a }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val jid = stageToJob.getOrElse(e.stageId, -1)
        jobs.synchronized {
          jobs.get(jid).foreach { a =>
            a.tasks += 1
            a.stages += e.stageId
            val m = e.taskMetrics
            if (m != null) {
              a.runMs += m.executorRunTime
              a.cpuNs += m.executorCpuTime
              a.shRead += m.shuffleReadMetrics.totalBytesRead
              a.shWrite += m.shuffleWriteMetrics.bytesWritten
              a.spill += m.diskBytesSpilled
              a.input += m.inputMetrics.bytesRead
            }
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val rows = fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // Drain the async listener bus BEFORE detaching: late-queued
    // onJobEnd/onTaskEnd events would otherwise print wall 0.000 and
    // undercount task metrics. Poll until every job has an end time,
    // bounded by a short timeout; report stragglers instead of zeros.
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var missing = jobs.synchronized { jobs.values.count(_.end == 0L) }
    while (missing > 0 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      missing = jobs.synchronized { jobs.values.count(_.end == 0L) }
    }
    // detach BEFORE the cache release so its unpersist jobs (outside the
    // measured wall) are not attributed to the query's job table
    spark.sparkContext.removeSparkListener(listener)
    graft.operators.Dedup.releaseAllCaches(spark)

    def mb(b: Long) = f"${b / 1048576.0}%8.1f"
    println(f"%n== $name: wall ${wall}%.3f s, $rows rows, ${jobs.size} jobs ==")
    if (missing > 0)
      println(s"!! $missing job(s) never reported an end event within 5s — " +
        "their wall is a lower bound")
    println(" job  wall_s tasks  stages  run_s  cpu_s  in_MB  shR_MB shW_MB spill_MB  desc")
    var jobWallSum = 0.0
    val intervals = mutable.ArrayBuffer.empty[(Long, Long)]
    jobs.toSeq.sortBy(_._1).foreach { case (jid, a) =>
      val w = math.max(0L, a.end - a.start) / 1e3
      jobWallSum += w
      if (a.end > a.start) intervals += ((a.start, a.end))
      println(f"$jid%4d $w%7.3f ${a.tasks}%5d ${a.stages.size}%6d " +
        f"${a.runMs / 1e3}%6.2f ${a.cpuNs / 1e9}%6.2f ${mb(a.input)} ${mb(a.shRead)} " +
        f"${mb(a.shWrite)} ${mb(a.spill)}  ${a.desc.take(60)}")
    }
    // merge overlapping [start,end] windows so concurrent jobs (broadcast
    // builds under the main job, the §2.6 thread-pool queries) are not
    // double-counted against the wall — jobWallSum alone overstates
    // busy time and can push the "driver gap" negative
    var merged = 0.0
    intervals.sortBy(_._1).foldLeft((0L, 0L)) { case ((cs, ce), (s2, e2)) =>
      if (s2 > ce) { merged += (ce - cs) / 1e3; (s2, e2) }
      else (cs, math.max(ce, e2))
    } match { case (cs, ce) => merged += (ce - cs) / 1e3 }
    println(f"== job wall sum ${jobWallSum}%.3f s (merged busy ${merged}%.3f s) " +
      f"vs query wall ${wall}%.3f s (driver gap ${wall - merged}%.3f s) ==")
    spark.stop()
  }
}
