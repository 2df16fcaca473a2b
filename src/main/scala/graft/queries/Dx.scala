package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic-aggregation helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against a
  * DuckDB oracle. Floating-point SUM/AVG over a 32-partition shuffle is
  * order-nondeterministic in the last ulps, so raw double aggregates would
  * flake the hash compare. The source money columns are doubles that carry
  * exact 2-decimal values (TPC-H-style prices/discounts/taxes), so we route
  * arithmetic through decimals:
  *
  *   - cast raw columns to DECIMAL(p,2) (exact, both engines round the same
  *     shortest-representation double to the same decimal),
  *   - multiply/sum in decimal (exact + associative => order-independent),
  *   - cast the final result back to DOUBLE (same exact decimal => same
  *     bits in Spark and DuckDB).
  *
  * Only raw ~2-decimal columns are ever cast to scale-2 decimals; computed
  * doubles (e.g. `1 - l_discount`) stay within one double op of an exact
  * 2-decimal value, which both engines also round identically.
  */
object Dx {
  /** Exact decimal view of a raw 2-decimal money/qty double column. */
  def dec(c: Column, p: Int = 12): Column = c.cast(DecimalType(p, 2))

  /** Order-independent SUM of a raw 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** Order-independent AVG (decimal sum / count), as double. */
  def davg(c: Column): Column = sum(dec(c)).cast("double") / count(c)

  /** `l_extendedprice * (1 - l_discount)` in exact decimal, for SUM. */
  def discounted(price: Column, discount: Column): Column =
    dec(price) * dec(lit(1) - discount, 8)

  /** `price * (1-disc) * (1+tax)` in exact decimal, for SUM. */
  def charged(price: Column, discount: Column, tax: Column): Column =
    dec(price) * dec(lit(1) - discount, 8) * dec(lit(1) + tax, 8)
}
