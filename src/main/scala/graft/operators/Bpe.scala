package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed word-frequency extraction,
  * bounded driver-side merge training, and a fully codegen'd distributed
  * encode — the tokenizer-training step of an LLM data pipeline
  * re-expressed in the engine's established shapes.
  *
  * Scale design mirrors the ANN codebooks (`Similarity.trainCodebook`):
  * the TRAINING input is not the corpus but the word-frequency table —
  * one distributed tokenize + count pass, cut to `topWords` rows with a
  * deterministic (count desc, word asc) tie-break — a bounded model
  * artifact on the driver, exactly how production tokenizers train
  * (frequency dict in memory, corpus on disk). Merge training is then a
  * driver-side loop over ≤ topWords short arrays: per round, count
  * adjacent symbol pairs weighted by word frequency (overlapping
  * occurrences counted, the classic formulation), pick the most frequent
  * with a total (freq desc, left asc, right asc) order, fuse it
  * greedily left-to-right in every word.
  *
  * The ENCODE side never leaves Catalyst: a word becomes its
  * bracket-delimited symbol string (`"ab"` → `"[a][b]"`) via one
  * `regexp_replace`, and each trained merge applies as one literal
  * `replace` — left-to-right, non-overlapping, exactly the greedy fuse —
  * so the whole chain is codegen'd string ops (no UDF, no mapPartitions,
  * no shuffle) and the per-token cost at 100 TB is a narrow map. The
  * bracket delimiters make merge patterns alignment-safe: a pattern
  * `"[l][l]"` cannot match inside `"[ll]"`.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Distributed word-frequency table, bounded to `topWords` rows:
    * (word, count) ordered count desc, word asc. One tokenize + one
    * aggregate over the corpus; the cut is the model-artifact boundary. */
  def wordCounts(docs: DataFrame, textCol: String, topWords: Int): Array[(String, Long)] =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** Greedy left-to-right fuse of one (left, right) pair in a symbol
    * sequence — the semantics of a non-overlapping string `replace`. */
  private[graft] def fuse(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` merges on a bounded word-frequency table. Stops
    * early if no adjacent pair remains. Deterministic: total order on
    * (freq desc, left asc, right asc). */
  def trainMerges(wordFreq: Array[(String, Long)], numMerges: Int): Array[Merge] = {
    // Delimiter contract: symbols must never contain '[' or ']' — the
    // encode side delimits symbols with brackets, so a bracket INSIDE a
    // symbol would silently corrupt every downstream merge match.
    // TextOps.tokens output satisfies this by construction; anything
    // else fails fast here rather than training a corrupt model.
    wordFreq.foreach { case (w, _) =>
      require(w.indexOf('[') < 0 && w.indexOf(']') < 0,
        s"Bpe.trainMerges: word '$w' contains a bracket delimiter; " +
          "feed words from TextOps.tokens (or strip [ ] upstream)")
    }
    var words = wordFreq.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words) {
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rt), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(r, l, rt, f)
        words = words.map { case (syms, c) => (fuse(syms, l, rt), c) }
        r += 1
      }
    }
    out.toArray
  }

  /** Column form of the encoder: word → bracketed symbol string after
    * all merges, entirely codegen'd (`regexp_replace` + literal
    * `replace` chain).
    *
    * Input contract: `word` must not contain the bracket delimiters
    * (`TextOps.tokens` output satisfies this by construction). A bracket
    * inside a word would alias the symbol delimiter and produce silently
    * wrong encodings, so the column RAISES on violation — two codegen'd
    * `instr` probes per row, negligible next to the merge chain. */
  def encodeWordCol(word: Column, merges: Seq[Merge]): Column = {
    val guarded = when(
      instr(word, "[") > 0 || instr(word, "]") > 0,
      raise_error(concat(
        lit("Bpe.encodeWordCol: word contains a bracket delimiter: "), word)))
      .otherwise(word)
    merges.foldLeft(regexp_replace(guarded, "(.)", "[$1]")) { (c, m) =>
      call_function("replace", c,
        lit(s"[${m.left}][${m.right}]"), lit(s"[${m.left}${m.right}]"))
    }
  }

  /** Symbol count of an encoded word: one `[` per symbol. */
  def symbolCountCol(encoded: Column): Column =
    length(encoded) - length(call_function("replace", encoded, lit("["), lit("")))
}
