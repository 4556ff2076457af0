package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    // 90% of the large side lands on one key
    val large = (1 to 1000).map { i =>
      (if (i <= 900) 1L else (i % 7).toLong, s"v$i")
    }.toDF("k", "payload")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "dim")

    val plain = large.join(small, "k")
    val salted = SkewJoin.saltedEquiJoin(large, small, "k", factor = 8)

    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("the shuffle key includes the salt (mechanism, not just result)") {
    val large = Seq((1L, "a")).toDF("k", "payload")
    val small = Seq((1L, "dim")).toDF("k", "dim")
    val plan = SkewJoin.saltedEquiJoin(large, small, "k", factor = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"))
  }
}
