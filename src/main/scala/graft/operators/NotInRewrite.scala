package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's only custom logical rewrite, re-expressed Spark-first:
  * `NotInSubqueryRewrite` (`core/src/optimizer.rs:73-90`, regression suite
  * `ballista/client/tests/null_aware.rs:144-149`) turns an uncorrelated
  * `e NOT IN (SELECT b FROM s)` into ordinary joins so no null-aware
  * (single-task) hash join is needed:
  *
  * {{{
  * Filter: __cnt = 0 OR (e IS NOT NULL AND __cnt = __cnt_non_null)
  *   CrossJoin                      // 1-row aggregate -> broadcast
  *     Aggregate: count(1) AS __cnt, count(b) AS __cnt_non_null
  *     LeftAnti Join: e = b        // ordinary, distributable anti join
  * }}}
  *
  * Three-valued `NOT IN` semantics hold: empty s passes all rows
  * (__cnt = 0); matched e is dropped by the anti join; NULL e with
  * non-empty s is dropped; any NULL b drops every remaining row
  * (__cnt <> __cnt_non_null).
  *
  * Spark plans single-column NOT IN natively (null-aware anti join), but —
  * like the reference — that operator concentrates probe state; this shape
  * uses only shuffle-able joins plus a broadcast of one aggregate row, so
  * it distributes over any cluster size.
  */
object NotInRewrite {

  /** `input WHERE e NOT IN (sub)` — `sub` must have exactly one column. */
  def notIn(input: DataFrame, e: Column, sub: DataFrame): DataFrame = {
    require(sub.columns.length == 1,
      s"NOT IN subquery must have one column, got ${sub.columns.length}")
    val b = sub.columns.head
    val counts = sub.agg(count(lit(1)).as("__cnt"),
      count(col(b)).as("__cnt_non_null"))
    input.join(sub, e === col(b), "left_anti")
      .crossJoin(counts)
      .filter(col("__cnt") === 0 ||
        (e.isNotNull && col("__cnt") === col("__cnt_non_null")))
      .drop("__cnt", "__cnt_non_null")
  }
}
