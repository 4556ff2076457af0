package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Term-separation probe for `st_sessions` (r15 verdict item 4): the
  * gate query's wall time bundles FOUR terms — fixture staging (a file
  * copy into the drop directory), the sentinel prep (a max(ts) corpus
  * scan + a 1-row write), the streaming micro-batch itself, and the
  * sink read-back — and its clean r14 ladder showed e≈1.24 on the
  * 300×→1000× segment with nobody knowing which term grows. This main
  * replicates the st_sessions recipe (queries/StreamingQueries.scala,
  * same staging, same sentinel, same EventStream.sessionCounts plan)
  * with a wall-clock per phase and the state-store partition count as
  * an ARGUMENT, so one run answers both questions: which term carries
  * the growth, and whether the fixed 8-partition stateful shuffle is
  * it (if so, the fix is the basketPairs lesson — derive the width
  * from input bytes).
  *
  * Usage: runMain graft.SessionProbe <statePartitions|derive> [samples]
  * honours SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val widthArg = args.headOption.getOrElse("8")
    val n = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val path = s"$sfDir/events.parquet"
    val width = widthArg match {
      case "derive" => derivedStateWidth(spark, path)
      case w => w.toInt
    }
    System.err.println(s"[probe] statePartitions=$width sf=$sfDir")

    (1 to n).foreach { i =>
      val t = run(spark, path, width, i)
      println(s"""{"probe":"st_sessions","sample":$i,"width":$width,""" +
        t.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString(",") +
        s""","sf":"$sfDir"}""")
      graft.operators.Dedup.releaseAllCaches(spark)
      System.gc()
    }
    spark.stop()
  }

  /** The st_sessions state sizing rule under test — delegates to the
    * production helper so the probe measures exactly what the gate
    * query runs. */
  def derivedStateWidth(spark: SparkSession, path: String): Int =
    graft.queries.StreamingQueries.stateWidthFor(spark, path)

  private def tmp(s: SparkSession, name: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_probe_${name}_${s.sparkContext.applicationId}").toString

  private def rmrf(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles).iterator.flatten.foreach(rec)
      f.delete(); ()
    }
    rec(new java.io.File(path))
  }

  private def copyInto(src: String, destDir: String, name: String): Unit = {
    val f = new java.io.File(src)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(destDir))
    val staged =
      if (f.isDirectory)
        f.listFiles.toSeq.filter(x => x.isFile && x.getName.startsWith("part-"))
          .sortBy(_.getName).zipWithIndex
          .map { case (p, i) => p -> s"${name}_part$i.parquet" }
      else Seq(f -> s"$name.parquet")
    staged.foreach { case (p, nm) =>
      java.nio.file.Files.copy(p.toPath,
        java.nio.file.Paths.get(destDir, nm),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def run(s: SparkSession, path: String, statePartitions: Int,
      sample: Int): Seq[(String, Double)] = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = s.read.parquet(path)
    val rawSchema = raw.schema
    val srcDir = tmp(s, s"sessprobe_src$sample")
    rmrf(srcDir)

    val (_, tStage) = timed { copyInto(path, srcDir, "events") }

    // sentinel prep: the max(ts) corpus scan is its own term — it is a
    // full parquet read the streaming query never sees
    val (sentFile, tSentinel) = timed {
      val sentTs = rawSchema("ts").dataType match {
        case LongType =>
          val maxTs = raw.agg(max("ts")).head.getLong(0)
          lit(maxTs + 172800L * 1000000000L)
        case tsType =>
          val maxUs = raw
            .agg(max(unix_micros(col("ts").cast(TimestampType))))
            .head.getLong(0)
          timestamp_micros(lit(maxUs + 172800L * 1000000L)).cast(tsType)
      }
      val sentDir = tmp(s, s"sessprobe_sent$sample")
      raw.limit(1).select(
        lit(-1L).as("event_id"), sentTs.as("ts"),
        lit(-1L).as("user_id"), lit("flush").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(sentDir)
      val part = new java.io.File(sentDir).listFiles
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(srcDir, "sentinel.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      sentDir
    }

    val outDir = tmp(s, s"sessprobe_out$sample")
    val ckDir = tmp(s, s"sessprobe_ck$sample")
    rmrf(outDir); rmrf(ckDir)
    val stream = graft.queries.Tables.normalizeEventTs(
      s.readStream.schema(rawSchema).parquet(srcDir))
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    val (_, tStream) = timed {
      s.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      try {
        val q = graft.streaming.EventStream
          .sessionCounts(stream, "30 minutes", "10 minutes")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckDir)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, _: Long) =>
            batch.write.mode("append").parquet(outDir); ()
          }
          .start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    }

    val (rows, tReadback) = timed {
      s.read.parquet(outDir)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          unix_micros(col("session_start")).as("session_start_us"),
          unix_micros(col("session_end")).as("session_end_us"),
          col("n_events"), col("sum_cents"))
        .orderBy("user_id", "session_start_us")
        .count()
    }
    System.err.println(s"[probe] sample=$sample rows=$rows")
    val total = tStage + tSentinel + tStream + tReadback
    rmrf(srcDir); rmrf(outDir); rmrf(ckDir); rmrf(sentFile)
    Seq("t_stage" -> tStage, "t_sentinel" -> tSentinel,
      "t_stream" -> tStream, "t_readback" -> tReadback, "t_total" -> total)
  }
}
