package graft

import graft.expressions.IvfPrunedIndex
import graft.operators.Similarity
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pins [[graft.expressions.IvfTopP]] (the multi-probe assignment kernel)
  * to the naive sorted-cell-tree reference: the returned cent_ids must be
  * exactly the first P of sort_array over every cell's (negsim, cent_id)
  * struct — same dot fold, same ordering, pruning exactness generalized
  * to a P-deep candidate set — and its head must always agree with
  * graft_ivf_top1. */
class IvfTopPSpec extends SparkSpec {
  import spark.implicits._

  private def naiveTopP(cb: Array[(Long, Seq[Double], Double)],
      p: Int): Column =
    slice(transform(
      sort_array(array(cb.map { case (cid, vec, nrm) =>
        val sim = call_function("graft_dot", col("__vd"), typedlit(vec)) /
          (col("__norm") * lit(nrm))
        struct((-sim).as("negsim"), lit(cid).as("cent_id"))
      }.toIndexedSeq: _*)),
      s => s.getField("cent_id")), 1, p)

  private def kernelTopP(cb: Array[(Long, Seq[Double], Double)], p: Int,
      probeGroups: Int = 0): Column =
    call_function("graft_ivf_topp",
      lit(IvfPrunedIndex.serialize(IvfPrunedIndex.build(cb, probeGroups))),
      col("__vd"), col("__norm"), lit(p))

  private def clustered = {
    val centers = Array.tabulate(12) { c =>
      Array.tabulate(64)(i => math.sin(c * 977 + i * 13).toFloat * 10f)
    }
    (0L until 300L).map { id =>
      val c = centers((id % 12).toInt)
      val v = Array.tabulate(64) { i =>
        c(i) + (math.sin(id * 64 + i) * 0.3).toFloat
      }
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  private def assertMatchesNaive(p: Int, cells: Int): Unit = {
    val cb = Similarity.coarseCodebookOf(clustered, "vec_id", "embedding", cells)
    val rows = Similarity.withNorm(clustered, "embedding")
      .select(col("vec_id"),
        naiveTopP(cb, p).as("e"), kernelTopP(cb, p).as("a"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"top-$p mismatch for vec ${r.getLong(0)}: " +
          s"expected ${r.getSeq[Long](1)}, got ${r.getSeq[Long](2)}")
    }
  }

  test("top-P equals the sorted cell tree on the grouped (pruned) path") {
    assertMatchesNaive(p = 3, cells = 48)
    assertMatchesNaive(p = 2, cells = 48)
  }

  test("top-P equals the sorted cell tree on the flat small-codebook path") {
    assertMatchesNaive(p = 3, cells = 7)
  }

  test("p >= k returns every cell, fully ranked") {
    assertMatchesNaive(p = 9, cells = 7)
  }

  test("head of top-P always equals graft_ivf_top1's cent_id (exact and " +
    "probed modes)") {
    val cb = Similarity.coarseCodebookOf(clustered, "vec_id", "embedding", 48)
    Seq(0, 3).foreach { pg =>
      val idxLit = lit(IvfPrunedIndex.serialize(IvfPrunedIndex.build(cb, pg)))
      val rows = Similarity.withNorm(clustered, "embedding")
        .select(
          call_function("graft_ivf_top1", idxLit, col("__vd"), col("__norm"))
            .getField("cent_id").as("t1"),
          kernelTopP(cb, 3, pg).as("tp"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(0) == r.getSeq[Long](1).head,
          s"probeGroups=$pg: top1=${r.getLong(0)} vs " +
            s"topP head=${r.getSeq[Long](1).head}")
      }
    }
  }

  test("duplicate-centroid ties break cent_id-asc at every rank") {
    val cb0 = Similarity.coarseCodebookOf(clustered, "vec_id", "embedding", 40)
    val cb = cb0.map { case t @ (cid, _, _) =>
      if (cid == 31L) (31L, cb0(9)._2, cb0(9)._3) else t
    }
    val probes = Seq((9000L, cb0(9)._2.map(_.toFloat).toArray))
      .toDF("vec_id", "embedding")
    val got = Similarity.withNorm(probes, "embedding")
      .select(kernelTopP(cb, 2).as("tp")).head().getSeq[Long](0)
    assert(got == Seq(9L, 31L), s"tie order wrong: $got")
  }

  test("zero-norm probe degrades to NaN sims: lowest cent_ids in order, " +
    "never a throw") {
    val cb = Similarity.coarseCodebookOf(clustered, "vec_id", "embedding", 40)
    val probes = Seq((9001L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.withNorm(probes, "embedding")
      .select(kernelTopP(cb, 3).as("tp")).head().getSeq[Long](0)
    assert(got == cb.map(_._1).sorted.take(3).toSeq)
  }
}
