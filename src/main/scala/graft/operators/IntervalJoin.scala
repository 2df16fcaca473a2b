package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless INTERVAL-OVERLAP join via coarse-bucket binning — the scale
  * form of "every left interval vs every right interval that overlaps
  * it" when no equi key exists to hang a band on (p02's shape needs
  * one). Declared naively that is a cartesian theta join, O(N·M); the
  * bin join restores an equi key: each interval explodes onto the
  * coarse time buckets it covers (fanout = span/bucketDays + 1,
  * bounded by the max interval length), the join runs on the bucket,
  * and each overlapping pair is credited EXACTLY ONCE — only in the
  * bucket containing the later of the two starts. That date lies
  * inside both intervals whenever they overlap, so both sides exploded
  * its bucket, and it is unique per pair — which kills the post-join
  * `distinct` a naive bin join needs (no second pair-grain shuffle).
  * The same decomposition drives interval joins in the genomics
  * engines (Hail, GenomicsDB) and Flink's window join.
  *
  * Intervals are half-open [start, end) over DATE/TIMESTAMP columns
  * with start <= end; zero-length intervals overlap nothing — the
  * predicate is `greatest(starts) < least(ends)`, the set definition
  * of non-empty intersection, which is false whenever either side is
  * empty (the two-clause `rStart < lEnd AND lStart < rEnd` form would
  * wrongly match [x,x) against any interval containing x). Output:
  * every column of `left` then every column of `right`, one row per
  * overlapping pair. Both inputs must be free of the internal names
  * `__bkt`/`__bktr`.
  *
  * At 100 TB the shuffle is keyed by time bucket — temporal locality
  * restored, partition-prunable, and skew equals genuine temporal
  * hot-spotting (addressable by narrowing bucketDays, which trades
  * fanout for key cardinality).
  */
object IntervalJoin {

  def overlap(left: DataFrame, right: DataFrame,
              lStart: String, lEnd: String,
              rStart: String, rEnd: String,
              bucketDays: Int = 30): DataFrame = {
    def bkt(c: Column): Column =
      floor(datediff(c, lit("1970-01-01")) / bucketDays)
    val lb = left.withColumn("__bkt",
      explode(sequence(bkt(col(lStart)), bkt(col(lEnd)))))
    val rb = right.withColumn("__bktr",
      explode(sequence(bkt(col(rStart)), bkt(col(rEnd)))))
    val outCols = left.columns.map(c => col(s"l.$c")) ++
      right.columns.map(c => col(s"r.$c"))
    lb.as("l").join(rb.as("r"),
        col("__bkt") === col("__bktr") &&
        greatest(col(s"l.$lStart"), col(s"r.$rStart")) <
          least(col(s"l.$lEnd"), col(s"r.$rEnd")) &&
        col("__bkt") ===
          bkt(greatest(col(s"l.$lStart"), col(s"r.$rStart"))))
      .select(outCols: _*)
  }
}
