package graft

import graft.operators.ColumnOps

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("validateRenames passes on valid mapping") {
    ColumnOps.validateRenames(Seq("a", "b"), Map("a" -> "x", "b" -> "y"))
  }

  test("validateRenames fails fast on missing source column") {
    val e = intercept[IllegalArgumentException] {
      ColumnOps.validateRenames(Seq("a"), Map("a" -> "x", "ghost" -> "y"))
    }
    assert(e.getMessage.contains("ghost"))
  }

  test("validateRenames fails on target over 150 chars") {
    val long = "x" * 151
    val e = intercept[IllegalArgumentException] {
      ColumnOps.validateRenames(Seq("a"), Map("a" -> long))
    }
    assert(e.getMessage.contains("150"))
  }

  test("renameAll renames in bulk") {
    val df = Seq((1, "p")).toDF("a", "b")
    val out = ColumnOps.renameAll(df, Map("a" -> "id", "b" -> "name"))
    assert(out.columns.toSeq == Seq("id", "name"))
  }

  test("normalizeHeaders strips whitespace and repairs mojibake in names") {
    val df = Seq((1, "x", "y")).toDF("  padded  ", "whatâ€™s", "Ãsland")
    val out = ColumnOps.normalizeHeaders(df)
    assert(out.columns.toSeq == Seq("padded", "what's", "island"))
  }
}
