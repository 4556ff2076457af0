package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via deterministic salting.
  *
  * A hot key concentrates an entire shuffle partition on one task; AQE's
  * skew-join split helps storage-level skew but not a single giant hash
  * bucket. Salting splits each hot key across `factor` buckets: the large
  * side gets a deterministic per-row salt (hash of the whole row — no RNG,
  * so re-runs and retries are stable), the small side replicates `factor`
  * times, and the join key becomes (key, salt). Result rows are identical
  * to the unsalted join; only the shuffle distribution changes.
  */
object SkewJoin {

  def saltedEquiJoin(
      large: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn(
      "__salt", pmod(xxhash64(large.columns.map(col): _*), lit(factor)))
    val replicated = small.withColumn(
      "__salt", explode(typedlit((0 until factor).map(_.toLong))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
