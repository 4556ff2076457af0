package graft

import org.apache.spark.sql.functions._

/** The ladder generator's linearity claim rests on the text
  * perturbation: distinct copies must never share a letter mapping, or
  * cross-copy exact duplicates reintroduce the quadratic pair blowup
  * the perturbation exists to prevent (the original Caesar-shift
  * implementation collided mod 26 — at factor 1000 every base document
  * would have carried ~38 identical clones). */
class ScaleUpSpec extends SparkSpec {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  test("permutations are deterministic, complete, and identity-free") {
    assert(ScaleUp.permuted(7) == ScaleUp.permuted(7))
    (1 to 1000).foreach { i =>
      val p = ScaleUp.permuted(i)
      assert(p.sorted == Lower, s"copy $i is not a permutation: $p")
      assert(p != Lower, s"copy $i collides with the identity (copy 0)")
    }
  }

  test("no mapping collision across 1000 copies (the mod-26 regression)") {
    val all = Lower +: (1 to 999).map(ScaleUp.permuted)
    assert(all.distinct.size == all.size)
    // the specific failure shape of the Caesar version: i and i+26 equal
    assert(ScaleUp.permuted(1) != ScaleUp.permuted(27))
  }

  test("permuteLetters preserves length, case shape, and non-letters") {
    val df = spark.createDataFrame(Seq(
      (0L, "The quick brown fox; 42 JUMPS over_the lazy dog!"),
      (1L, ""))).toDF("id", "text")
    val out = df.select(
      col("text"),
      ScaleUp.permuteLetters(col("text"), 5).as("p5"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    out.foreach { case (src, dst) =>
      assert(src.length == dst.length)
      src.zip(dst).foreach { case (a, b) =>
        assert(a.isUpper == b.isUpper && a.isLower == b.isLower)
        if (!a.isLetter) assert(a == b, s"non-letter '$a' must pass through")
      }
    }
    // same letter maps consistently -> token-equality structure survives
    val m = out.keys.find(_.nonEmpty).get.zip(out(out.keys.find(_.nonEmpty).get))
      .filter(_._1.isLetter).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    m.foreach { case (a, bs) => assert(bs.size == 1, s"'$a' maps to $bs") }
  }
}
