package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Parallel global bounded window — the analogue of the reference's
  * `PartitionedBoundedWindowAggExec`
  * (`core/src/execution_plans/partitioned_bounded_window_agg.rs:18-60`),
  * which lifts a no-PARTITION-BY, bounded-ROWS-frame window off a single
  * partition by running it on K range-disjoint partitions plus "halo" rows
  * copied across each boundary for lookback.
  *
  * Spark-first composition (no custom SparkPlan):
  *   1. bucket cuts from `approxQuantile` on the order key (driver holds K
  *      doubles — same footprint as Spark's own RangePartitioner sample);
  *   2. every row gets its range bucket; the last `preceding` rows of each
  *      bucket are ALSO emitted as halo rows of the next bucket;
  *   3. the bounded window runs partitioned BY BUCKET (parallel, one
  *      shuffle), halo rows supply cross-boundary lookback and are then
  *      dropped.
  *
  * Result is row-identical to the serial `OVER (ORDER BY ...)` plan for
  * ROWS BETWEEN `preceding` PRECEDING AND CURRENT ROW frames, provided
  * every bucket holds at least `preceding` rows (pick
  * nBuckets ≲ n / (10·preceding)). The precondition is enforced at
  * runtime: a bucket with fewer than `preceding` rows raises
  * IllegalArgumentException instead of returning a silently truncated
  * rolling aggregate.
  */
object ParallelWindow {

  /** Bounded rolling aggregate over a global (un-partitioned) ordering.
    *
    * @param df        input
    * @param orderCol  numeric order key (global ordering, with tiebreak)
    * @param tieCol    unique tiebreaker column
    * @param agg       aggregate to apply over the frame, e.g.
    *                  sum(dec(col("value")))
    * @param preceding frame size: ROWS BETWEEN preceding PRECEDING AND
    *                  CURRENT ROW
    * @param nBuckets  number of range partitions
    * @param out       output column name
    */
  def rollingAgg(df: DataFrame, orderCol: String, tieCol: String,
                 agg: Column, preceding: Int, nBuckets: Int,
                 out: String): DataFrame = {
    // The input feeds FOUR consumers (quantile sample, guard counts, the
    // halo branch, the main branch — the last two are both live in the
    // returned plan's union). Persist once so the operator costs one
    // input computation instead of four; MEMORY_AND_DISK so oversized
    // partitions spill rather than evict at 100 TB. Lifecycle: the lazy
    // contract leaves no in-query unpersist point; long-lived sessions
    // flush via spark.catalog.clearCache() between queries (Bench/Verify
    // do).
    val in = df.persist(StorageLevel.MEMORY_AND_DISK)

    // 1. range cuts (driver-side: K-1 doubles, like RangePartitioner).
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts = in.stat.approxQuantile(orderCol, probs, 0.001)

    // 2. deterministic bucket id: #cuts strictly below the key.
    val bucketExpr = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(orderCol) > c, 1).otherwise(0)
    }
    val bucketed = in.withColumn("__bucket", bucketExpr)

    // Fail-fast precondition guard (reads the persisted input: a
    // map-side-combined count per bucket, ≤ nBuckets rows to the driver).
    // Every bucket below the highest occupied one must donate `preceding`
    // halo rows to its successor; a smaller (or empty — duplicate cuts
    // under key skew) bucket would silently truncate cross-boundary
    // lookback. Better a loud error than a wrong rolling aggregate.
    val sizes = bucketed.groupBy(col("__bucket")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (sizes.nonEmpty) (0 until sizes.keys.max).foreach { b =>
      val c = sizes.getOrElse(b, 0L)
      require(c >= preceding,
        s"ParallelWindow precondition violated: bucket $b holds $c rows " +
          s"but the ROWS frame needs $preceding lookback rows per bucket; " +
          s"lower nBuckets (pick nBuckets <= n / (10*preceding)) or run " +
          s"the serial window")
    }

    // halo: last `preceding` rows of each bucket, re-tagged into the next.
    val wTail = Window.partitionBy(col("__bucket"))
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    val halo = bucketed
      .withColumn("__rev", row_number().over(wTail))
      .filter(col("__rev") <= preceding && col("__bucket") < nBuckets - 1)
      .drop("__rev")
      .withColumn("__bucket", col("__bucket") + 1)
      .withColumn("__halo", lit(true))
    val all = bucketed.withColumn("__halo", lit(false)).unionByName(halo)

    // 3. bounded window per bucket; halo rows feed lookback then drop out.
    val w = Window.partitionBy(col("__bucket"))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-preceding, 0)
    all.withColumn(out, agg.over(w))
      .filter(!col("__halo"))
      .drop("__bucket", "__halo")
  }
}
