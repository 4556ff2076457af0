package graft

import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift regression guard (r8 lesson: a silent testdata `ts`
  * re-encoding broke all 29 event queries and was only caught by the
  * driver's correctness run, a full round later). Writes its OWN parquet
  * fixtures in each of the three encodings `Tables.normalizeEventTs`
  * handles — int64 nanos (read back as long via the legacy conf), naive
  * TIMESTAMP_NTZ, and session-zoned TIMESTAMP — and asserts all three
  * normalize to the SAME TimestampType instant. The next encoding drift
  * fails here, in `sbt test`, not in the driver.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // 2023-05-01T12:34:56.789Z, expressed in micros
  private val micros = 1682944496789000L

  private def writeRead(dir: String, df: org.apache.spark.sql.DataFrame) = {
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("normalizeEventTs maps all three fixture encodings to one TimestampType instant") {
    val base = java.nio.file.Files.createTempDirectory("graft-tables").toString

    // arm 1: int64 (the nanosAsLong read path delivers LongType nanos)
    val asLong = writeRead(s"$base/long",
      Seq(micros * 1000L).toDF("ts"))
    // arm 2: TIMESTAMP_NTZ (naive micros, isAdjustedToUTC=false)
    val asNtz = writeRead(s"$base/ntz",
      Seq(micros).toDF("us").select(
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    // arm 3: session-zoned TIMESTAMP
    val asLtz = writeRead(s"$base/ltz",
      Seq(micros).toDF("us").select(timestamp_micros(col("us")).as("ts")))

    for ((df, arm) <- Seq(asLong -> "long", asNtz -> "ntz", asLtz -> "ltz")) {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType, s"arm $arm type")
      val got = out.select(unix_micros(col("ts"))).as[Long].head()
      // sessions run UTC (SparkSpec sets it), so the NTZ re-tag preserves
      // the naive micros value — the exact equivalence the oracle's
      // epoch_us(ts) comparison depends on
      assert(got == micros, s"arm $arm value: $got != $micros")
    }
  }

  test("normalizeEventTs rejects a fourth encoding at the boundary") {
    val bad = Seq("2023-05-01").toDF("ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }
}
