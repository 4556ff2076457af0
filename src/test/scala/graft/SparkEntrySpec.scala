package graft

/** Driver-contract invariants. */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns rows on sf0.001 fixtures") {
    assume(new java.io.File("/root/testdata/sf0.001/orders.parquet").exists())
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    assert(out.columns.contains("Demographic"))
  }

  test("every oracle key has a query implementation") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("non-oracled queries are the documented SQL-inexpressible ones only") {
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled == Set("sim_topk_lsh", "sim_topk_ivf"),
      s"unexpected unoracled: $unoracled")
  }
}
