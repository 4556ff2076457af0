package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr}

/** A/B probe for the driver-memory law's switch point (SCALE.md r15):
  * runs the FULL SemDeDup pair pipeline at the corpus-scaled k both
  * ways — single-level (codebook = driver artifact, k cells) vs the
  * two-level form `semanticNearDupPairs` switches to above
  * `Similarity.MaxDriverCells` (L1 = ⌈√k⌉ driver cells, L2 refined
  * distributively) — and prints per-sample train/pair seconds plus the
  * MEASURED driver codebook bytes of each form, so the law's cost at
  * the crossover is a number, not a design note.
  *
  * The two forms are different (legitimate) blocking choices, so pair
  * counts differ slightly; the probe reports both counts for context.
  *
  * usage: TwoLevelProbe [samples]   (honours SPARK_GRAFT_SF_DIR/_CPUS)
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val k = math.max(16, math.ceil(emb.count() / 128.0).toInt)
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt
    val m2 = math.ceil(k.toDouble / k1).toInt
    // GRAFT_L1_PROBES overrides the L1 multi-probe width; the default 2
    // mirrors the COMMITTED two-level branch (semanticPairs /
    // semanticNearDupPairs both probe top-2 L1 cells since r17 — set 1
    // to reproduce the pre-r17 top-1 arm of the frontier table);
    // pair sets dedup (a, b) because a pair can surface in shared blocks
    val l1Probes = sys.env.get("GRAFT_L1_PROBES").map(_.toInt).getOrElse(2)
    System.err.println(s"k=$k k1=$k1 m2=$m2 l1Probes=$l1Probes sf=$sfDir")

    def timed[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def fmt(d: Double) = f"$d%.3f"

    // ---- single-level: k driver cells (the sub-law path) ----
    var singleBytes = 0L
    var singleCnt = 0L
    val single = (1 to n).map { _ =>
      val (tt, cb) = timed(Similarity.trainCodebook(
        emb, "vec_id", "embedding", k, 2, probeGroups = 8))
      singleBytes = org.apache.spark.util.SizeEstimator.estimate(cb)
      val (tp, c) = timed(Similarity.semanticNearDupPairs(
        emb, "vec_id", "embedding", 0.35,
        codebookOpt = Some(cb), probeGroups = 8).count())
      singleCnt = c
      graft.operators.Dedup.releaseAllCaches(spark)
      (tt, tp)
    }

    // ---- two-level: forced via maxDriverCells below k (the above-law
    // path, exactly the branch semanticPairs takes above 2^16) ----
    var twoBytes = 0L
    var twoCnt = 0L
    val two = (1 to n).map { _ =>
      val (tt, l1) = timed(Similarity.trainCodebook(
        emb, "vec_id", "embedding", k1, 2, probeGroups = 8))
      twoBytes = org.apache.spark.util.SizeEstimator.estimate(l1)
      val (tp, c) = timed(Similarity.cosineNearDupPairs(
        Similarity.twoLevelClustered(emb, "vec_id", "embedding", l1, m2,
          probeGroups = 8, l1Probes = l1Probes),
        "vec_id", "embedding", "__cell", 0.35)
        .dropDuplicates("a", "b").count())
      twoCnt = c
      graft.operators.Dedup.releaseAllCaches(spark)
      (tt, tp)
    }

    // ---- recall: the r15 verdict's missing number. Both forms emit
    // pairs ABOVE THE SAME SCORE THRESHOLD under different (legitimate)
    // blocking, so single-level — the exhaustive-within-cell form whose
    // cells the k = n/128 law sizes — is the reference set, and recall
    // = |two ∩ single| / |single| quantifies what the bounded-driver
    // branch loses. Training is fixed-point deterministic (no RNG), so
    // re-deriving the frames here reproduces the timed runs' outputs
    // bit-for-bit. ----
    // Recall is threshold-stratified: at the gate's 0.35 operating
    // threshold the above-threshold pair set is enormous (cos ≥ 0.35 is
    // weak similarity) and ANY ~128-member blocking samples a thin,
    // clustering-dependent slice of it, so two different clusterings
    // overlap little by construction. What dedup actually acts on is
    // the HIGH-similarity stratum — recall there says whether the
    // bounded-driver branch loses real near-dups or just swaps which
    // weak pairs it happens to score.
    val strata = Seq(0.35, 0.60, 0.80, 0.90)
    val recallJson = {
      val cb = Similarity.trainCodebook(
        emb, "vec_id", "embedding", k, 2, probeGroups = 8)
      val ps = Similarity.semanticNearDupPairs(
        emb, "vec_id", "embedding", 0.35,
        codebookOpt = Some(cb), probeGroups = 8)
        .select(col("a"), col("b"), col("score_r")).persist()
      val l1 = Similarity.trainCodebook(
        emb, "vec_id", "embedding", k1, 2, probeGroups = 8)
      val pt = Similarity.cosineNearDupPairs(
        Similarity.twoLevelClustered(emb, "vec_id", "embedding", l1, m2,
          probeGroups = 8, l1Probes = l1Probes),
        "vec_id", "embedding", "__cell", 0.35)
        .select("a", "b").dropDuplicates("a", "b").persist()
      val parts = strata.map { t =>
        val ref = ps.filter(col("score_r") >= t)
        val refCnt = ref.count()
        val c = ref.join(pt, Seq("a", "b"), "left_semi").count()
        val r = if (refCnt == 0) 1.0 else c.toDouble / refCnt
        s""""t$t":{"single_pairs":$refCnt,"common":$c,"recall":${fmt(r)}}"""
      }
      // ---- planted-truth recall (r16 verdict item 3): when the fixture
      // carries PlantClusters ids, ground truth is derivable from the id
      // arithmetic alone — same-cluster pairs with their TRUE cosine —
      // and both forms' recall is measured against it where dedup
      // actually operates (the high-similarity strata), on real support
      // instead of the ladder fixtures' 30 noise-level pairs. ----
      val plantedJson = sys.env.get("GRAFT_PLANT_BASE").map(_.toLong).map { base =>
        val stride = PlantClusters.PlantStride
        val pv = emb.filter(col("vec_id") >= base)
          .select(col("vec_id").cast("long").as("id"),
            (((col("vec_id").cast("long") - base) / stride)
              .cast("long")).as("cl"),
            col("embedding").as("v"))
          .persist()
        val l = pv.select(col("cl"), col("id").as("a"), col("v").as("va"))
        val r = pv.select(col("cl"), col("id").as("b"), col("v").as("vb"))
        val dot = expr("aggregate(zip_with(va, vb, (x, y) -> " +
          "cast(x as double) * cast(y as double)), cast(0.0 as double), " +
          "(acc, x) -> acc + x)")
        def nrm(c: String) = expr(s"sqrt(aggregate($c, cast(0.0 as double), " +
          s"(acc, x) -> acc + cast(x as double) * cast(x as double)))")
        val truth = l.join(r, Seq("cl")).filter(col("a") < col("b"))
          .select(col("a"), col("b"),
            (dot / (nrm("va") * nrm("vb"))).as("true_cos"))
          .persist()
        // loss attribution: a truth pair can only surface if both ends
        // CO-BLOCK — so measure, per stratum, how often truth pairs
        // share the L1 cell vs the full (L1, L2) cell. L1 loss means
        // coarse-cell straddling; L2 loss means the distributed
        // sub-codebook splits them
        val asg = Similarity.twoLevelClustered(
          emb, "vec_id", "embedding", l1, m2, probeGroups = 8)
          .select(col("vec_id").cast("long").as("id"), col("__cell"))
          .persist()
        val withCells = truth
          .join(asg.select(col("id").as("a"), col("__cell").as("ca")), Seq("a"))
          .join(asg.select(col("id").as("b"), col("__cell").as("cb")), Seq("b"))
          .persist()
        val byStratum = Seq(0.60, 0.80, 0.90).map { t =>
          val tp = withCells.filter(col("true_cos") >= t)
          val n = tp.count()
          val inS = tp.join(ps, Seq("a", "b"), "left_semi").count()
          val inT = tp.join(pt, Seq("a", "b"), "left_semi").count()
          val sameL1 = tp.filter(
            (col("ca") / m2).cast("long") === (col("cb") / m2).cast("long"))
            .count()
          val sameCell = tp.filter(col("ca") === col("cb")).count()
          def rec(c: Long) = if (n == 0) 1.0 else c.toDouble / n
          s""""t$t":{"truth_pairs":$n,"single_recall":${fmt(rec(inS))},""" +
            s""""two_level_recall":${fmt(rec(inT))},""" +
            s""""same_l1":${fmt(rec(sameL1))},"same_cell":${fmt(rec(sameCell))}}"""
        }
        pv.unpersist(); truth.unpersist()
        asg.unpersist(); withCells.unpersist()
        byStratum.mkString("{", ",", "}")
      }.getOrElse("null")
      ps.unpersist(); pt.unpersist()
      graft.operators.Dedup.releaseAllCaches(spark)
      (parts.mkString("{", ",", "}"), plantedJson)
    }

    println(s"""{"probe":"two_level_crossover","k":$k,"k1":$k1,"m2":$m2,""" +
      s""""single":{"train_sec":[${single.map(s => fmt(s._1)).mkString(",")}],""" +
      s""""pairs_sec":[${single.map(s => fmt(s._2)).mkString(",")}],""" +
      s""""driver_bytes":$singleBytes,"pairs":$singleCnt},""" +
      s""""two_level":{"train_sec":[${two.map(s => fmt(s._1)).mkString(",")}],""" +
      s""""pairs_sec":[${two.map(s => fmt(s._2)).mkString(",")}],""" +
      s""""driver_bytes":$twoBytes,"pairs":$twoCnt},""" +
      s""""recall_by_threshold":${recallJson._1},""" +
      s""""planted_truth_recall":${recallJson._2}}""")
    spark.stop()
  }
}
