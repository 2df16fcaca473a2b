package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Source registration — the analogue of the reference's
  * `register_parquet`/`ListingTable` surface (SURVEY.md §2B scans row).
  * Tables are one parquet file each under `sfDir` (TESTDATA.md).
  *
  * `events.ts` compat: the engine's temporal operators (as-of joins,
  * sessionization, TWAP — `queries/Temporal.scala`, `streaming/`) work
  * on an epoch-nanosecond BIGINT `ts`. The original corpus stored
  * parquet `timestamp[ns]`, which Spark (no ns-timestamp type) already
  * surfaced as exactly that long; a regenerated corpus ships
  * `timestamp[us]` instead, which Spark reads as TIMESTAMP_NTZ —
  * [[load]] normalizes either vintage back to epoch-ns at the source
  * boundary, a zero-shuffle codegen'd projection folded into the scan.
  * The DuckDB oracles need no adaptation: DuckDB reads both vintages
  * as native timestamps (TIMESTAMP_NS / TIMESTAMP), which is what the
  * oracle SQL was always written against.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** `ts` → epoch-ns BIGINT, whatever the stored type. The NTZ leg is
    * timezone-independent (an interval diff from the NTZ epoch, not a
    * session-tz cast); the TimestampType leg is exact by definition. */
  private def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
      case TimestampType => df.withColumn("ts",
        (unix_micros(col("ts")) * lit(1000L)))
      case other =>
        throw new IllegalStateException(s"events.ts unexpected type $other")
    }

  /** Register all tables as temp views (for the SQL entry path). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
