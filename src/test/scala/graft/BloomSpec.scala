package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def serialize(bf: org.apache.spark.util.sketch.BloomFilter): Array[Byte] =
    graft.expressions.BloomMightContain.serialize(bf)

  test("graft_bloom_contains never false-negatives on inserted members") {
    GraftFunctions.register(spark)
    val members = (0 until 2000).map(i => s"member-gram-$i").toDF("g")
    val bytes = serialize(members.stat.bloomFilter("g", 4096, 0.03))
    val misses = members
      .filter(!call_function("graft_bloom_contains", lit(bytes), col("g")))
      .count()
    assert(misses == 0L, s"bloom filter dropped $misses true members")
  }

  test("graft_bloom_contains false-positive rate is near the configured fpp") {
    GraftFunctions.register(spark)
    val members = (0 until 2000).map(i => s"member-gram-$i").toDF("g")
    val bytes = serialize(members.stat.bloomFilter("g", 4096, 0.03))
    val nonMembers = (0 until 10000).map(i => s"other-gram-$i").toDF("g")
    val fp = nonMembers
      .filter(call_function("graft_bloom_contains", lit(bytes), col("g")))
      .count()
    // fpp 0.03 over 10k probes ⇒ ~300 expected; 3x headroom kills flake
    assert(fp < 900, s"false-positive rate implausibly high: $fp / 10000")
  }

  test("null and empty filter literals fail analysis with a named error") {
    GraftFunctions.register(spark)
    val probe = Seq("x").toDF("g")
    val nullLit = lit(null).cast("binary")
    val eNull = intercept[Exception] {
      probe.filter(call_function("graft_bloom_contains", nullLit, col("g"))).collect()
    }
    assert(eNull.getMessage.contains("graft_bloom_contains"), eNull.getMessage)
    val eEmpty = intercept[Exception] {
      probe.filter(call_function("graft_bloom_contains",
        lit(Array.empty[Byte]), col("g"))).collect()
    }
    assert(eEmpty.getMessage.contains("graft_bloom_contains"), eEmpty.getMessage)
  }

  test("truncated filter bytes raise a deserialization error naming the function") {
    GraftFunctions.register(spark)
    val members = (0 until 100).map(i => s"m$i").toDF("g")
    val bytes = serialize(members.stat.bloomFilter("g", 256, 0.03))
    val e = intercept[Exception] {
      Seq("x").toDF("g")
        .filter(call_function("graft_bloom_contains",
          lit(bytes.take(8)), col("g"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("graft_bloom_contains")),
      s"no cause in the chain names the function: $e")
  }

  test("interpreted eval matches codegen for the same filter") {
    GraftFunctions.register(spark)
    val members = (0 until 100).map(i => s"m$i").toDF("g")
    val bytes = serialize(members.stat.bloomFilter("g", 256, 0.03))
    val probe = ((0 until 100).map(i => s"m$i") ++
      (0 until 100).map(i => s"x$i")).toDF("g")
    val viaCol = probe
      .withColumn("hit", call_function("graft_bloom_contains", lit(bytes), col("g")))
      .orderBy("g").collect().map(r => (r.getString(0), r.getBoolean(1)))
    val bf = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    viaCol.foreach { case (g, hit) =>
      assert(hit == bf.mightContainString(g),
        s"expression/driver disagreement on $g")
    }
  }
}
