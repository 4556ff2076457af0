package graft

import graft.sources.Compaction
import java.nio.file.{Files, Paths}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet")).toSeq

  test("writeCompacted bounds the output file count") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val df = (1 to 1000).toDF("n").repartition(32) // the small-files shape
    Compaction.writeCompacted(df, s"$dir/out", numFiles = 2)
    assert(partFiles(s"$dir/out").size == 2)
    assert(spark.read.parquet(s"$dir/out").count() == 1000)
  }

  test("maxRecordsPerFile splits oversized partitions at write time") {
    val dir = Files.createTempDirectory("graft_compact2").toString
    val df = (1 to 1000).toDF("n")
    Compaction.writeCompacted(df, s"$dir/out", numFiles = 1,
      maxRecordsPerFile = 300)
    // 1000 rows / ≤300 per file → at least 4 files from the one partition
    assert(partFiles(s"$dir/out").size >= 4)
    assert(spark.read.parquet(s"$dir/out").count() == 1000)
  }
}
