package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates: declarative constraints evaluated in ONE pass over
  * the table (a single aggregation of conditional counts — no per-rule
  * scans), plus key-uniqueness and referential checks that need their own
  * keyed shuffles. The output is a (rule, violations) frame a pipeline
  * can alert or abort on before bad data reaches training.
  */
object QualityChecks {

  /** One row per rule: how many input rows violate it. All rules share a
    * single scan + aggregate (conditional sums), unpivoted with typed
    * Column expressions — rule names are data, never interpolated into
    * SQL (quotes/backticks in a name are fine). A null predicate result
    * counts as a violation (unknown is not a pass), and an EMPTY input
    * reports 0 violations per rule, not null — a gate predicate like
    * `violations > 0` must stay two-valued. */
  def ruleViolations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val agg = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L))
        .as(s"__r$i")
    }
    val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__r$i").as("violations"))
    }
    df.agg(agg.head, agg.tail: _*)
      .select(explode(array(pairs: _*)).as("r"))
      .select(col("r.rule"), col("r.violations"))
  }

  /** Row-level expectation routing (the Delta-Live-Tables/Great-
    * Expectations "quarantine" shape): every row gains `failed_rules`,
    * the names of the rules it violates in declaration order, built as
    * one narrow projection — no per-rule scan, no shuffle, and the
    * split into a valid stream (`failed_rules` empty) and a quarantine
    * stream (non-empty) is two filters over the SAME stage, so Catalyst
    * shares the scan when both sinks run in one action. Null predicate
    * results fail the rule (unknown is not a pass). */
  def withFailedRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val hits = rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }
    df.withColumn("failed_rules",
      filter(array(hits: _*), c => c.isNotNull))
  }

  /** The quarantine stream: rows failing at least one expectation. */
  def quarantine(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    withFailedRules(df, rules).filter(size(col("failed_rules")) > 0)

  /** The valid stream: rows passing every expectation. */
  def expectAll(df: DataFrame, rules: Seq[(String, Column)]): DataFrame =
    withFailedRules(df, rules).filter(size(col("failed_rules")) === 0)
      .drop("failed_rules")

  /** Count of rows sharing a key with at least one other row. */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))

  /** Count of child rows whose key has no parent (referential breakage) —
    * a left-anti join, no row duplication. */
  def orphanCount(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
}
