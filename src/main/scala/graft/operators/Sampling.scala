package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * RNG-based sampling (`df.sample`, `sampleBy`) is seed-and-partitioning
  * dependent: a retry, a repartition, or a different engine draws a
  * DIFFERENT sample, which breaks auditability and incremental reruns at
  * 100 TB. Hash-based Bernoulli sampling is the scale-safe form: a row is
  * in the sample iff a content-derived hash of its key lands under the
  * rate threshold — a pure narrow filter (pushdown-friendly, no state, no
  * shuffle), reproducible across engines, runs, retries, and repartitions,
  * and stable under incremental appends (new rows never change old rows'
  * membership).
  */
object Sampling {

  /** 16-bit uniform hash bucket of the key: first 4 md5 hex digits as an
    * integer in [0, 65536). md5-of-string is engine-portable (identical in
    * the DuckDB oracle), unlike murmur/xxhash seeds. */
  def hashBucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Deterministic Bernoulli sample: keep rows whose bucket < rate·65536. */
  def bernoulli(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket16(col(keyCol)) < math.round(rate * 65536).toInt)

  /** Weighted Bernoulli (Poisson) sampling: per-row inclusion probability
    * PROPORTIONAL to an integer weight column — `P(keep) = min(1,
    * w·num/65536)` — the importance-sampling form curation pipelines use
    * to over-select long or high-quality documents. Same determinism
    * contract as [[bernoulli]]: content-hash threshold, no RNG, a pure
    * narrow filter that pushes to the scan, membership stable under
    * appends and repartitions. The threshold arithmetic is exact-integer
    * on both engines, so the sample is bit-reproducible in the oracle. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      num: Int): DataFrame =
    df.filter(hashBucket16(col(keyCol)) <
      least(col(weightCol).cast("long") * num, lit(65536L)))

  /** Domain-mixture resampling: derive per-stratum keep thresholds that
    * steer the OBSERVED stratum counts toward `targetWeights` at
    * `outputFraction` of the corpus, then apply the same deterministic
    * hash filter as [[stratified]].
    *
    * The observed counts are one tiny aggregate pulled to the driver
    * (#strata rows — a model artifact, like the IVF codebook); the
    * applied predicate is still a single narrow CASE filter over the full
    * corpus. A stratum needing more than 100% keeps everything (under-
    * represented domains can only be upsampled by epoch repetition,
    * which is a training-loader concern, not a filter's). */
  def mixToTarget(
      df: DataFrame, keyCol: String, strataCol: String,
      targetWeights: Map[String, Double], outputFraction: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    val thresholds = counts.map { case (s, n) =>
      val w = targetWeights.getOrElse(s, 0.0)
      s -> math.min(65536L, math.round(outputFraction * total * w / n * 65536))
    }
    val thr = thresholds.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, t)) => acc.when(col(strataCol) === s, lit(t))
    }.otherwise(lit(0L))
    df.filter(hashBucket16(col(keyCol)) < thr)
  }

  /** Deterministic global shuffle: reorder the corpus by a seeded
    * content hash of the key — the "shuffle the training data" step
    * every epoch pipeline runs before sequence packing. RNG shuffles
    * (`orderBy(rand(seed))`) are partitioning-dependent and unrepayable
    * by an external engine; md5(seed ‖ key) gives the same permutation
    * on every engine, run, retry, and partition layout, and a different
    * seed gives an independent permutation per epoch.
    *
    * Scale shape: ONE range-partitioned total sort on the hash column —
    * and because the sort key is a uniform hash, the range partitions
    * are balanced BY CONSTRUCTION (no skewed-key hot partition, unlike
    * sorting on a natural column). `shuffle_key` stays in the output so
    * downstream packing can verify or resume the order. */
  def deterministicShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
      md5(concat(lit(seed), lit(":"), col(keyCol).cast("string"))))
      // secondary key: duplicate keyCol values hash identically, and a
      // hash-only sort would leave their relative order partition-layout-
      // dependent — breaking the "same permutation everywhere" contract
      .orderBy(col("shuffle_key"), col(keyCol))

  /** Deterministic N-way split (train/val/test): cumulative cut points
    * over the same 16-bit content hash label every row with exactly one
    * split — a pure narrow projection (no shuffle, no RNG), so the same
    * row lands in the same split on every engine, run, retry, and after
    * any future append (new rows never move old rows between splits —
    * the property that keeps eval sets uncontaminated as the corpus
    * grows). Fractions must sum to 1; cut points accumulate the per-split
    * rounding so the thresholds are reproducible integers. */
  def split(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val cuts = splits.scanLeft(0L) {
      case (acc, (_, f)) => acc + math.round(f * 65536)
    }.tail
    val b = hashBucket16(col(keyCol))
    val labeled = splits.zip(cuts).init.foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), cut)) => acc.when(b < cut, lit(name))
    }.otherwise(lit(splits.last._1))
    df.withColumn("split", labeled)
  }

  /** Stratified deterministic sample: per-stratum rates, same hash. Strata
    * missing from `rates` fall back to `defaultRate`. The whole predicate
    * stays one narrow CASE filter — no per-stratum scans, no shuffle. */
  def stratified(
      df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(when(lit(false), lit(0))) {
      case (acc, (stratum, rate)) =>
        acc.when(col(strataCol) === stratum, lit(math.round(rate * 65536).toInt))
    }.otherwise(lit(math.round(defaultRate * 65536).toInt))
    df.filter(hashBucket16(col(keyCol)) < threshold)
  }
}
