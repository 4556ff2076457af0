package graft

import scala.util.Random
import graft.operators.{Dedup, Packing, Sampling}
import org.apache.spark.sql.functions._

/** Randomized invariants for the curation operators, each checked against
  * a brute-force single-machine reference. Seeded RNG keeps failures
  * reproducible.
  */
class CurationProperties extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(20260812L)

  test("seqPack bins agree with a sequential fold on random streams") {
    val docs = (1L to 300L).map(i =>
      (i, s"s${rng.nextInt(4)}", 1 + rng.nextInt(900)))
    val got = Packing.seqPack(
      docs.toDF("id", "stream", "n"), "id", "stream", col("n"), budget = 1024)
      .select("id", "start_offset", "bin")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // sequential reference: per stream in id order, running offset
    val want = docs.groupBy(_._2).flatMap { case (_, ds) =>
      var off = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val r = id -> (off, off / 1024)
        off += n
        r
      }
    }.toMap
    assert(got == want)
  }

  test("bernoulli sample == brute-force md5 threshold membership") {
    val keys = (1L to 2000L).map(i => rng.nextLong().abs)
    val got = Sampling.bernoulli(keys.toDF("k"), "k", 0.15)
      .as[Long].collect().toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(k: Long): Long = {
      md.reset()
      val d = md.digest(k.toString.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 8 | (d(1) & 0xffL))
    }
    val want = keys.filter(bucket(_) < math.round(0.15 * 65536)).toSet
    assert(got == want)
  }

  test("connectedComponents labels equal brute-force union-find") {
    val n = 60
    val pairs = (1 to 80).map(_ =>
      (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter(p => p._1 != p._2)
    val got = Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    // brute-force union-find
    val parent = Array.tabulate(n.toLong.toInt)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // canonical label = min node id in the component
    val byRoot = nodes.groupBy(v => find(v.toInt))
    val want = byRoot.values.flatMap { vs =>
      val m = vs.min
      vs.map(_ -> m)
    }.toMap
    assert(got == want)
  }

  test("minhash pairs are a subset of all-pairs and contain every high-jaccard pair") {
    // docs built from a small vocab so shingle overlap is common
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 60L).map { i =>
      val words = (0 until 12).map(_ => vocab(rng.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    val got = Dedup.minhashNearDupPairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute-force: exact jaccard over 3-shingles for every pair
    def sh(t: String) = Dedup.shingle(Dedup.tokenize(t), 3).toSet
    val all = for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = sh(ta); sb = sh(tb) if sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size; union = (sa | sb).size
    } yield ((a, b), inter * 2 >= union, inter == union)
    val qualifying = all.filter(_._2).map(_._1).toSet
    val identical = all.filter(_._3).map(_._1).toSet
    // LSH may miss borderline pairs but every reported pair must qualify…
    assert(got.subsetOf(qualifying))
    // …and identical shingle-sets collide in every band: guaranteed found
    assert(identical.subsetOf(got))
  }
}
