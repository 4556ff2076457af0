package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * sequences, the concat-then-chunk packing LLM pretraining uses.
  *
  * Each stream (e.g. source/domain) is processed independently: documents
  * are laid out in deterministic key order, the running token total is a
  * window cumulative sum, and a doc's bin is `floor(start_offset / budget)`
  * — so bin boundaries are pure integer arithmetic over the prefix sums,
  * reproducible anywhere.
  *
  * Scale shape: ONE shuffle (the window partition by stream); the
  * cumulative sum is a streaming frame (rows unbounded-preceding..current)
  * — no buffering of the partition, no driver loop. Skewed streams split
  * with the usual salting pattern (pack per (stream, salt), then offset
  * bins by salt ranges).
  */
object Packing {

  /** (docId, stream, n_tokens, start_offset, bin) per document. */
  def seqPack(
      df: DataFrame, idCol: String, streamCol: String,
      tokensCol: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(streamCol), tokensCol.cast("long").as("n_tok"))
      .withColumn("start_offset", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin", floor(col("start_offset") / budget))
  }
}
