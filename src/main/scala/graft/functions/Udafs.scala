package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface — the Spark analogue of the reference's
  * `ballista_aggregate_functions` registration
  * (`core/src/extension.rs:67-90`, `BallistaFunctionRegistry.aggregate`).
  *
  * `SumSqCents`: exact sum-of-squares of a 2-decimal column, carried in
  * integer cents — overflow-safe for bounded magnitudes, shuffle-order
  * independent (integer addition is associative), and mergeable
  * (partial-agg friendly: Spark runs reduce per partition then merge
  * across the shuffle, the same split the reference's AggregateExec
  * partial→final modes express).
  */
object Udafs {

  /** Exact Σ (100·x)² over a 2-decimal double column. */
  object SumSqCents extends Aggregator[Double, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, x: Double): Long = {
      val cents = math.round(x * 100)
      acc + cents * cents
    }
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Register all graft UDAFs on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.udf.register("sumsq_cents", udaf(SumSqCents))
}
