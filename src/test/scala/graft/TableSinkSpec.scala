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

  test("writeTable overwrite evolves the schema, incl. names with / and %") {
    // the semantics overwriteSchema exists for (ref utils.py:139): a
    // re-write with added/renamed columns — survey headers contain / ? % #
    // — must succeed and the catalog must serve the NEW schema, not fail
    // or silently keep the old one
    val v1 = Seq((1, "a")).toDF("id", "v")
    assert(TableSink.writeTable(v1, "tsink_evo"))
    val v2 = Seq((2, 0.5, "x"), (3, 0.7, "y"))
      .toDF("id", "Share %", "Race/Ethnicity")
    assert(TableSink.writeTable(v2, "tsink_evo"))
    val back = spark.table("tsink_evo")
    assert(back.columns.toSeq == Seq("id", "Share %", "Race/Ethnicity"))
    assert(back.count() == 2)
  }

  test("writeTable swallows failures and reports false") {
    val df = Seq((1, "a")).toDF("id", "v")
    assert(!TableSink.writeTable(df, "not a legal.table.name!"))
  }
}
