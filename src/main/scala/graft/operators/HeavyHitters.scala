package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters with bounded memory — the
  * Misra-Gries + exact-recount recipe:
  *
  * Phase 1 runs a k-counter Misra-Gries summary INSIDE each partition
  * (O(k) memory however large the partition). Pigeonhole over the
  * partition split guarantees every item with global count > n/k
  * survives at least one partition's summary, so the union of
  * per-partition candidates (≤ k × partitions rows — a bounded model
  * artifact, the codebook pattern) is a SUPERSET of the true heavy
  * hitters. Phase 2 recounts ONLY the candidates exactly: a broadcast
  * semi-join gates the scan, so the count shuffle carries candidate
  * rows instead of the whole corpus, and the final `count·k > n`
  * filter makes the result EXACT — the sketch bounds memory and
  * shuffle volume, never correctness (the same contract as the
  * bloom-gated decontamination join).
  */
object HeavyHitters {

  /** Per-partition Misra-Gries: at most k counters survive. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      if (counters.contains(x)) counters(x) += 1L
      else if (counters.size < k) counters(x) = 1L
      else {
        // decrement-all: drop zeroed counters
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.keysIterator.foreach { key =>
          val c = counters(key) - 1L
          if (c == 0L) dead += key else counters(key) = c
        }
        dead.foreach(counters.remove)
      }
    }
    counters.keysIterator.toArray.iterator
  }

  /** Items of `valueCol` whose exact count strictly exceeds n/k, with
    * exact counts. Output: (item, cnt), ordered cnt desc then item. */
  def exactHeavyHitters(items: Dataset[String], k: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val candidates = items.mapPartitions(misraGries(_, k)).distinct()
      .toDF("item")
    val total = items.toDF("item").agg(count(lit(1)).as("n_total"))
    items.toDF("item")
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * k > col("n_total"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
