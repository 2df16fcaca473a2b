package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join by key salting.
  *
  * When one join key dominates (a "hot key"), a plain hash-partitioned
  * join sends every row of that key to ONE reducer — the classic 100 TB
  * straggler. Salting splits each key across `nSalts` reducers:
  *
  *  - the SKEWED (probe) side gets a deterministic salt in [0, nSalts)
  *    derived from a per-row column (any high-cardinality column works —
  *    determinism keeps the differential oracle exact, where rand() would
  *    flake the hash gate);
  *  - the BUILD side is replicated nSalts times (explode of a literal
  *    range — cheap when the build side is the smaller relation);
  *  - the join key becomes (key, salt), so the hot key's rows spread
  *    over nSalts partitions and merge back losslessly (result set is
  *    row-identical to the unsalted join).
  *
  * This is the manual analogue of what AQE skew-join does at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, also on in [[graft.GraftSession]]);
  * the reference handles the same problem by re-partitioning stages at
  * runtime cuts (`core/src/execution_plans/unordered_range_repartition.rs`,
  * doc :17-54). Keep AQE as the default; reach for explicit salting when
  * the skew is *known* and stable (e.g. a null-heavy or default-valued key).
  */
object SaltedJoin {

  /** Inner equi-join `left(keyL) = right(keyR)` with `left` treated as the
    * skewed side. `saltSource` must be a `left` column expression; the salt
    * is `pmod(hash(saltSource), nSalts)`.
    */
  def inner(left: DataFrame, right: DataFrame, keyL: String, keyR: String,
            saltSource: Column, nSalts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(hash(saltSource), lit(nSalts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    // Side-qualified references: with keyL == keyR (or the key name
    // present on both inputs) unqualified col(...) would be ambiguous.
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
          salted(keyL) === replicated(keyR))
      .drop("__salt")
  }
}
