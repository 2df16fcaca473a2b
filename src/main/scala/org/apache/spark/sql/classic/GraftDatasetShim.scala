package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the `private[sql]` Dataset.ofRows — the supported way for
  * extension libraries to turn a custom LogicalPlan (here: Chaos.ChaosNode)
  * into a DataFrame. Kept to the single call, nothing else reaches into
  * Spark internals. */
object GraftDatasetShim {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
