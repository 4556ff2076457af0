package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges picks frequency-then-lexicographic argmax and chains fuses") {
    // "abab"×3 + "abc"×2: pair counts round 1 — (a,b): 3·2+2 = 8,
    // (b,a): 3, (b,c): 2 → merge 1 = (a,b) freq 8. Round 2 over
    // [ab][ab]×3, [ab][c]×2 — (ab,ab): 3, (ab,c): 2 → merge 2 = (ab,ab).
    val merges = Bpe.trainMerges(Array("abab" -> 3L, "abc" -> 2L), 3)
    assert(merges.map(m => (m.rank, m.left, m.right, m.freq)).toSeq == Seq(
      (1, "a", "b", 8L), (2, "ab", "ab", 3L), (3, "ab", "c", 2L)))
  }

  test("ties break on smaller left then right symbol") {
    // "ba" and "ab" each once: (b,a) and (a,b) both freq 1 → (a,b) wins
    val m = Bpe.trainMerges(Array("ba" -> 1L, "ab" -> 1L), 1)
    assert((m.head.left, m.head.right) == ("a", "b"))
  }

  test("fuse is greedy left-to-right, non-overlapping") {
    assert(Bpe.fuse(Array("l", "l", "l"), "l", "l").toSeq == Seq("ll", "l"))
    assert(Bpe.fuse(Array("a", "b", "a", "b"), "a", "b").toSeq == Seq("ab", "ab"))
  }

  test("degenerate inputs: empty frequency table and zero merges") {
    assert(Bpe.trainMerges(Array.empty, 5).isEmpty)
    // single-char words have no pairs: training stops immediately
    assert(Bpe.trainMerges(Array("a" -> 10L, "b" -> 3L), 5).isEmpty)
    // zero merges → pure char split
    val enc = Seq("ab").toDF("w")
      .select(Bpe.encodeWordCol(col("w"), Nil)).collect().head.getString(0)
    assert(enc == "[a][b]")
  }

  test("bracket-delimiter contract fails fast on both sides") {
    // training: a word containing the delimiter would train a corrupt
    // model — reject at the boundary
    val ex = intercept[IllegalArgumentException] {
      Bpe.trainMerges(Array("a[b" -> 1L), 2)
    }
    assert(ex.getMessage.contains("bracket delimiter"))
    // encoding: a delimiter-carrying word raises instead of silently
    // producing a wrong encoding
    val thrown = intercept[Exception] {
      Seq("ok", "bad]word").toDF("w")
        .select(Bpe.encodeWordCol(col("w"), Nil)).collect()
    }
    assert(thrown.getMessage != null)
    // and clean words still encode through the guarded column
    val enc = Seq("ab").toDF("w")
      .select(Bpe.encodeWordCol(col("w"), Nil)).collect().head.getString(0)
    assert(enc == "[a][b]")
  }

  test("column encoder equals the driver-side fuse chain on every word") {
    val words = Seq("abab", "abc", "banana", "aa", "x", "")
    val merges = Bpe.trainMerges(
      Array("abab" -> 3L, "abc" -> 2L, "banana" -> 5L), 4).toSeq
    val viaCol = words.toDF("w")
      .select(col("w"), Bpe.encodeWordCol(col("w"), merges).as("enc"),
        Bpe.symbolCountCol(Bpe.encodeWordCol(col("w"), merges)).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    for (w <- words) {
      val syms = merges.foldLeft(w.map(_.toString).toArray) {
        (s, m) => Bpe.fuse(s, m.left, m.right) }
      val expected = syms.map(s => s"[$s]").mkString
      assert(viaCol(w) == ((expected, syms.length)), s"word '$w'")
    }
  }
}
