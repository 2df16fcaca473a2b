package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-partition predicate dispatch — the analogue of the reference's
  * `PerPartitionFilterExec` (`core/src/execution_plans/
  * per_partition_filter.rs:18-35`): apply a DIFFERENT predicate to each
  * input partition (the reference uses it to trim rows straddling
  * range-shuffle sub-part boundaries while keeping multi-partition tasks
  * packed).
  *
  * Spark-first: `spark_partition_id()` is evaluated per-row inside
  * whole-stage codegen, so dispatching on it composes the k predicates
  * into ONE codegen'd filter — no custom physical node, no mapPartitions
  * boundary breaking codegen. Partition ids are stable within a stage
  * (they are the task's partition index), which is exactly the contract
  * the reference's `predicates[k]` ↔ `execute(k)` pairing relies on.
  */
object PerPartitionFilter {

  /** Keep a row in partition `k` iff `predicates(k)` holds (rows in
    * partitions >= predicates.length pass a final `default`). */
  def filter(df: DataFrame, predicates: Seq[Column],
             default: Column = lit(true)): DataFrame = {
    val pid = spark_partition_id()
    val dispatched = predicates.zipWithIndex.tail
      .foldLeft(when(pid === 0, predicates.head)) { case (acc, (p, k)) =>
        acc.when(pid === k, p)
      }
      .otherwise(default)
    df.filter(dispatched)
  }
}
