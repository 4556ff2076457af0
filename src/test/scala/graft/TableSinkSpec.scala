package graft

import graft.sources.TableSink

class TableSinkSpec extends SparkSpec {
  import spark.implicits._

  test("writeTable overwrites and is re-readable via the catalog") {
    val df1 = Seq((1, "a")).toDF("id", "v")
    assert(TableSink.writeTable(df1, "tsink_t1"))
    val df2 = Seq((2, "b"), (3, "c")).toDF("id", "v")
    assert(TableSink.writeTable(df2, "tsink_t1"))
    assert(spark.table("tsink_t1").count() == 2)
  }

  test("writeTable swallows failures and reports false") {
    val df = Seq((1, "a")).toDF("id", "v")
    assert(!TableSink.writeTable(df, "not a legal.table.name!"))
  }
}
