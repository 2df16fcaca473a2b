package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent right
  * row with `right.ts <= left.ts` within the same key group.
  *
  * Spark-first composition (preference order (a) from the build brief —
  * no custom physical operator needed): tag both sides, union, and take
  * `last(..., ignoreNulls)` over a (key, ts)-ordered running window; right
  * rows sort BEFORE left rows at equal ts so ties count as matches
  * (matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` inclusive bound).
  *
  * Scale shape: ONE hash shuffle on the key + per-partition sort — the
  * same cost as a sort-merge join, no point-in-time subquery per row, no
  * range explosion. Window partitions are per-key, so skew follows key
  * cardinality (salt hot keys upstream if a key dominates).
  */
object AsOfJoin {

  /** @param left      left rows
    * @param right     right rows
    * @param key       equality key column name (both sides)
    * @param ts        event-time column name (both sides, orderable)
    * @param rightCols right columns to carry (renamed `asof_<name>`)
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame =
    asof(left, right, key, ts, rightCols, forwardDir = false)

  /** Forward as-of: for every left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the key group (ties match) — the "next
    * event after" direction (DuckDB: `ASOF JOIN ... ON l.ts <= r.ts`).
    * Same union+window plan over time reversed: one shuffle. */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
              rightCols: Seq[String]): DataFrame =
    asof(left, right, key, ts, rightCols, forwardDir = true)

  /** Backward as-of with a TOLERANCE bound (the pandas `merge_asof
    * tolerance=` / kdb `wj` semantic): the match is the most recent right
    * row within `tolerance` of the left timestamp — staler matches are
    * nulled, the left row is kept. `ts` must be numeric (integer epoch
    * units). The gap test runs on `ts div truncateTo`-truncated values so
    * an engine (or sink) that carries coarser timestamps computes the
    * SAME keep set — truncate FIRST, then diff; diff-then-truncate
    * rounds differently at the boundary. Plan shape is unchanged from
    * [[backward]]: the matched right ts rides the same running window as
    * the carried columns, so tolerance costs zero extra shuffles. */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
                     ts: String, rightCols: Seq[String], tolerance: Long,
                     truncateTo: Long = 1L): DataFrame =
    asof(left, right, key, ts, rightCols, forwardDir = false,
      tolerance = Some((tolerance, truncateTo)))

  /** NEAREST as-of (the pandas `merge_asof direction='nearest'`
    * semantic): for every left row, the right row minimizing
    * |right.ts − left.ts| within the key group; an exact tie
    * (equidistant earlier and later rights) resolves BACKWARD. `ts`
    * must be numeric (integer epoch units) so the distance compare is
    * exact.
    *
    * Shape: the same tagged union as [[backward]], with BOTH directions'
    * running `last(..., ignoreNulls)` windows over ONE hash exchange on
    * the key (ascending and descending passes share the partitioning;
    * the plan is Exchange → Sort+Window ×2 → projection — still no
    * point-in-time subquery, no range join, no second shuffle). The
    * closer side is picked per row in a final codegen'd projection, and
    * `asof_dir_back` (1 backward / 0 forward) makes the choice a
    * data-visible fact. */
  def nearest(left: DataFrame, right: DataFrame, key: String, ts: String,
              rightCols: Seq[String]): DataFrame = {
    val passthrough = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val bCar = rightCols.map(c => s"__b_$c") :+ "__brts"
    val fCar = rightCols.map(c => s"__f_$c") :+ "__frts"

    val taggedRight = right.select(
      (col(key) +: col(ts).as("__ts") +: lit(0).as("__src") +:
        tieCol(right, rightCols) +:
        (rightCols.map(c => col(c).as(s"__b_$c")) ++
          Seq(col(ts).as("__brts")) ++
          rightCols.map(c => col(c).as(s"__f_$c")) ++
          Seq(col(ts).as("__frts")))) ++
        passthrough.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(ts).as("__ts") +: lit(1).as("__src") +:
        nullTieCol(right, rightCols) +:
        (bCar ++ fCar).map(c => lit(null).as(c))) ++
        passthrough.map(col): _*)

    // __tie makes same-timestamp right rows deterministic: among right
    // rows tied on (key, ts) the GREATEST carried tuple wins — in both
    // directions (the __tie.asc puts it last under each frame, where
    // last(ignoreNulls) reads it). Left rows carry a null tie and only
    // ever tie with each other, where the pick doesn't matter.
    val wB = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__src"), col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wF = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__src"), col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = taggedRight.unionByName(taggedLeft)
      .select(col(key) +: col("__ts") +: col("__src") +:
        (passthrough.map(col) ++
          bCar.map(c => last(col(c), ignoreNulls = true).over(wB).as(c)) ++
          fCar.map(c => last(col(c), ignoreNulls = true).over(wF).as(c))): _*)

    val backWins = col("__frts").isNull ||
      (col("__brts").isNotNull &&
        (col("__ts") - col("__brts")) <= (col("__frts") - col("__ts")))
    val picked = rightCols.foldLeft(matched) { (d, c) =>
      d.withColumn(s"asof_$c",
        when(backWins, col(s"__b_$c")).otherwise(col(s"__f_$c")))
    }
    picked
      .withColumn("asof_dir_back",
        when(col("__brts").isNull && col("__frts").isNull,
          lit(null).cast("long"))
          .otherwise(when(backWins, 1L).otherwise(0L)))
      .filter(col("__src") === 1)
      .drop(bCar ++ fCar :+ "__src" :+ "__tie": _*)
      .withColumnRenamed("__ts", ts)
  }

  /** Deterministic same-(key, ts) tie-break: the struct of the carried
    * right columns, ordered ascending so `last()` under the running
    * frame reads the greatest tuple. Non-orderable carried types (map)
    * are excluded — they can't participate in a window ORDER BY, and
    * including them failed analysis where pre-tie-break versions
    * executed; rows identical on every ORDERABLE carried column are
    * indistinguishable to the tie-break (if ALL carried columns are
    * non-orderable the struct is empty and the pick stays arbitrary
    * but the join still executes). */
  private def orderableTieCols(right: DataFrame,
                               rightCols: Seq[String]): Seq[String] = {
    val types = right.schema.fields.map(f => f.name -> f.dataType).toMap
    rightCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(types(c)))
  }

  private def tieCol(right: DataFrame, rightCols: Seq[String]): Column =
    struct(orderableTieCols(right, rightCols).map(col): _*).as("__tie")

  /** The left side's null of the same struct type (unionByName needs
    * the exact type). */
  private def nullTieCol(right: DataFrame,
                         rightCols: Seq[String]): Column = {
    val tieType = right
      .select(struct(orderableTieCols(right, rightCols).map(col): _*)
        .as("__tie"))
      .schema("__tie").dataType
    lit(null).cast(tieType).as("__tie")
  }

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   ts: String, rightCols: Seq[String],
                   forwardDir: Boolean,
                   tolerance: Option[(Long, Long)] = None): DataFrame = {
    val passthrough = left.columns.toSeq.filterNot(c => c == key || c == ts)
    // The matched right row's own ts rides along as one more carried
    // column when a tolerance bound needs it.
    val carried = rightCols.map(c => s"asof_$c") ++
      (if (tolerance.isDefined) Seq("__rts") else Nil)

    val taggedRight = right.select(
      (col(key) +: col(ts).as("__ts") +: lit(0).as("__src") +:
        tieCol(right, rightCols) +:
        (rightCols.map(c => col(c).as(s"asof_$c")) ++
          (if (tolerance.isDefined) Seq(col(ts).as("__rts")) else Nil))) ++
        passthrough.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      (col(key) +: col(ts).as("__ts") +: lit(1).as("__src") +:
        nullTieCol(right, rightCols) +:
        (rightCols.map(c => lit(null).as(s"asof_$c")) ++
          (if (tolerance.isDefined) Seq(lit(null).as("__rts")) else Nil))) ++
        passthrough.map(col): _*)

    // Backward: ascending time, right-before-left at equal ts, so last()
    // sees the latest right <= l.ts. Forward: DESCENDING time (right
    // still first at equal ts) — the last right seen walking backward
    // from +inf is the SMALLEST right >= l.ts.
    val timeOrder =
      if (forwardDir) col("__ts").desc else col("__ts").asc
    // __tie.asc: among right rows tied on (key, ts), the greatest
    // carried tuple wins (see [[tieCol]]) — same rule both directions.
    val w = Window.partitionBy(col(key))
      .orderBy(timeOrder, col("__src"), col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val matched = taggedRight.unionByName(taggedLeft)
      .select(col(key) +: col("__ts") +: col("__src") +:
        (passthrough.map(col) ++
          carried.map(c => last(col(c), ignoreNulls = true).over(w).as(c))): _*)

    val bounded = tolerance match {
      case None => matched
      case Some((tol, trunc)) =>
        val gapOk = col("__rts").isNotNull &&
          (expr(s"__ts div $trunc") - expr(s"__rts div $trunc")) <= tol
        rightCols.map(c => s"asof_$c").foldLeft(matched) { (d, c) =>
          d.withColumn(c, when(gapOk, col(c)))
        }.drop("__rts")
    }

    bounded.filter(col("__src") === 1)
      .drop("__src", "__tie")
      .withColumnRenamed("__ts", ts)
  }
}
