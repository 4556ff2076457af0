package graft

import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Graph

  // Hand-computed, N=3, S=1e12: r0 = 333333333333 each, teleport =
  // 15e12/300 = 50000000000. Edges 1→2, 2→1, 3→1 (all out-degree 1).
  // After one round: node 1 receives r(2)+r(3) = 666666666666 →
  // 50000000000 + (85·666666666666)//100 = 616666666666; node 2
  // receives r(1) → 333333333333; node 3 receives nothing → teleport.
  test("pageRankScaled matches the hand-computed integer fixed point") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r = Graph.pageRankScaled(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(
      1L -> 616666666666L, 2L -> 333333333333L, 3L -> 50000000000L))
  }

  test("rank mass never exceeds the scale and every node keeps the teleport floor") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val r = Graph.pageRankScaled(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect()
    assert(r.map(_._2).sum <= 1000000000000L)
    val teleport = 15L * 1000000000000L / (100L * 3)
    assert(r.forall(_._2 >= teleport))
  }

  test("partition count does not change the integer result") {
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L), (1L, 3L), (2L, 3L))
    val one = Graph.pageRankScaled(
      e.toDF("src", "dst").repartition(1), "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    val many = Graph.pageRankScaled(
      e.toDF("src", "dst").repartition(7), "src", "dst", 2)
      .as[(Long, Long)].collect().toMap
    assert(one == many)
  }

  // Path 1→2→3→4→5 plus shortcut 1→4: distances from {1} are
  // 2:1, 3:2, 4:1 (shortcut wins over the 3-hop path), 5:2.
  test("bfsHops takes the minimum hop count when paths compete") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val d = Graph.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))
  }

  test("bfsHops bounds the walk at maxHops and ignores unreachable nodes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val d = Graph.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4 is 3 hops; 9/10 disconnected
  }

  test("bfsHops multi-source: each node gets the nearest seed's distance") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val d = Graph.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("bfsHops terminates early when the frontier empties") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    // maxHops far beyond the graph diameter must not loop or error
    val d = Graph.bfsHops(edges, "src", "dst", seeds, "id", maxHops = 50)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L))
  }

  test("ssspWeighted minimizes WEIGHT, not hops, and respects the hop bound") {
    // 1→4 direct costs 10; 1→2→3→4 costs 1+1+1=3 but needs 3 hops
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("id")
    val at3 = Graph.ssspWeighted(edges, "src", "dst", "w", seeds, "id", 3)
      .as[(Long, Long)].collect().toMap
    assert(at3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // with only 2 hops allowed, the cheap path is out of reach: the
    // direct edge's cost stands
    val at2 = Graph.ssspWeighted(edges, "src", "dst", "w", seeds, "id", 2)
      .as[(Long, Long)].collect().toMap
    assert(at2(4L) == 10L)
  }

  test("pageRankScaled at deep iteration counts matches an exact integer replay") {
    // 20 iterations: per-round lineage truncation keeps each round's plan
    // a constant-depth step over the previous round's LogicalRDD — before
    // the truncation landed, round N nested N copies of the join subtree
    // and analysis time exploded at this depth. Exact integer arithmetic
    // makes a driver-side replay the oracle.
    val edgeSeq = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L), (5L, 3L))
    val scale = 1000000000000L
    val iters = 20
    val nodes = (edgeSeq.map(_._1) ++ edgeSeq.map(_._2)).distinct.sorted
    val deg = edgeSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val teleport = 15L * scale / (100L * nodes.size)
    var ref = nodes.map(_ -> scale / nodes.size).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((a, b) <- edgeSeq) contrib(b) += ref(a) / deg(a)
      ref = nodes.map(id => id -> (teleport + 85L * contrib(id) / 100L)).toMap
    }
    val got = Graph.pageRankScaled(
      edgeSeq.toDF("src", "dst"), "src", "dst", iters = iters)
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("pageRankScaled under the reliable checkpoint strategy is bit-identical") {
    // spark.graft.checkpointDir switches every Checkpointer.truncate from
    // localCheckpoint to reliable checkpoint files; the integer result
    // must not move, and the files must actually land in the dir.
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    spark.conf.set(graft.operators.Checkpointer.DirKey, ckDir)
    try {
      val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
      val r = Graph.pageRankScaled(edges, "src", "dst", iters = 1)
        .as[(Long, Long)].collect().toMap
      assert(r == Map(
        1L -> 616666666666L, 2L -> 333333333333L, 3L -> 50000000000L))
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "reliable mode must write checkpoint files")
    } finally spark.conf.unset(graft.operators.Checkpointer.DirKey)
  }

  test("ssspWeighted multi-source takes the cheapest seed and stops when stable") {
    val edges = Seq((1L, 3L, 5L), (2L, 3L, 2L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L, 2L).toDF("id")
    // maxHops beyond stabilization must not loop; node 3 takes seed 2's
    // cheaper edge
    val d = Graph.ssspWeighted(edges, "src", "dst", "w", seeds, "id", 10)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 0L, 3L -> 2L, 4L -> 3L))
  }
}
