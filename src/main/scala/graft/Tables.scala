package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source registration — the analogue of the reference's
  * `register_parquet`/`ListingTable` surface (SURVEY.md §2B scans row).
  * Tables are one parquet file each under `sfDir` (TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables as temp views (for the SQL entry path). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
