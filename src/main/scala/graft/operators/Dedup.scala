package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact keep-first,
  * hash-group dedup, minhash+LSH banded near-dup, and n-gram Jaccard
  * verification.
  *
  * Scale design (the whole point): near-dup candidate generation NEVER
  * does an all-pairs join. Docs shuffle by (band index, band hash) — an
  * O(n·bands) shuffle — and only same-bucket docs pair up. Jaccard
  * verification then touches candidate pairs only. The Jaccard score is
  * carried as exact integers (|A∩B|, |A∪B|) so thresholding is an integer
  * compare with no float-rounding hazard.
  */
object Dedup {

  /** Exact dedup keeping the first row per key by `orderCol` — the
    * deterministic form of dropDuplicates (which keeps an arbitrary row). */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-doc minhash signatures + shingles. */
  def withShinglesAndSigs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame = {
    val words = TextOps.tokens(col(textCol))
    val sh = TextOps.shingles(words, k)
    val base = df.select(col(idCol), sh.as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sigs = (0 until numHashes).map(h =>
      TextOps.minhashSig(col("shingles"), h))
    base.withColumn("bandkeys", TextOps.bandKeys(sigs, bands = numHashes / 2))
  }

  /** Candidate near-dup pairs via banded LSH, verified with exact shingle
    * Jaccard. Returns (a, b, inter, union) with a < b; a pair is emitted
    * iff 2·inter ≥ union (Jaccard ≥ 0.5).
    */
  def minhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 8): DataFrame = {
    val docs = withShinglesAndSigs(df, idCol, textCol, k, numHashes)
      .persist()
    val banded = docs.select(
      col(idCol), posexplode(col("bandkeys")).as(Seq("band_idx", "band_hash")))
    // Shuffle key is (band_idx, band_hash): same-bucket docs co-locate, so
    // the pair join is local to each bucket — no all-pairs blowup.
    val x = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("a"))
    val y = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("b"))
    val cands = x.join(y, Seq("band_idx", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val sa = docs.select(col(idCol).as("a"), col("shingles").as("sha"))
    val sb = docs.select(col(idCol).as("b"), col("shingles").as("shb"))
    cands.join(sa, "a").join(sb, "b")
      .withColumn("n_inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("n_union", size(col("sha")) + size(col("shb")) - col("n_inter"))
      .filter(col("n_inter") * 2 >= col("n_union"))
      .select(col("a"), col("b"), col("n_inter").cast("long").as("n_inter"), col("n_union").cast("long").as("n_union"))
  }

  /** n-gram Jaccard near-dup with cheap exact-prefix blocking: candidates
    * share md5(prefix) buckets, then exact shingle Jaccard verifies. */
  def prefixBlockedJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 50, k: Int = 2): DataFrame = {
    val words = TextOps.tokens(col(textCol))
    val base = df.select(
      col(idCol),
      md5(substring(col(textCol), 1, prefixLen)).as("blk"),
      TextOps.shingles(words, k).as("sh"))
    val a = base.select(col("blk"), col(idCol).as("a"), col("sh").as("sha"))
    val b = base.select(col("blk"), col(idCol).as("b"), col("sh").as("shb"))
    a.join(b, "blk").filter(col("a") < col("b"))
      .withColumn("n_inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("n_union", size(col("sha")) + size(col("shb")) - col("n_inter"))
      .select(col("a"), col("b"), col("n_inter").cast("long").as("n_inter"), col("n_union").cast("long").as("n_union"))
      .distinct()
  }
}
