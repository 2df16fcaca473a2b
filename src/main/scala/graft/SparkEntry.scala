package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query inventories. Every entry that has a
  * DuckDB-expressible equivalent also appears in [[oracleSql]] with
  * identical column aliases (the driver sorts columns by name and
  * hash-compares values).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (graft.queries.Relational.queries, graft.queries.Relational.oracle),
    (graft.queries.Windows.queries, graft.queries.Windows.oracle),
    (graft.queries.Aggregates.queries, graft.queries.Aggregates.oracle),
    (graft.queries.SetOps.queries, graft.queries.SetOps.oracle),
    (graft.queries.Subqueries.queries, graft.queries.Subqueries.oracle),
    (graft.queries.Functions.queries, graft.queries.Functions.oracle),
    (graft.queries.Ops.queries, graft.queries.Ops.oracle),
    (graft.queries.Temporal.queries, graft.queries.Temporal.oracle),
    (graft.queries.Composite.queries, graft.queries.Composite.oracle),
    (graft.queries.H2o.queries, graft.queries.H2o.oracle),
    (graft.llm.Dedup.queries, graft.llm.Dedup.oracle),
    (graft.llm.TextAnalysis.queries, graft.llm.TextAnalysis.oracle),
    (graft.llm.Similarity.queries, graft.llm.Similarity.oracle),
    (graft.llm.Multimodal.queries, graft.llm.Multimodal.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    queries("q1_agg")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)

  /** Skip list with reasons — the mirror of the reference's pinned skip
    * mechanism (`benchmarks/src/bin/tpcds.rs:63-71` skips q31/q71 with
    * reasons; `context_unsupported.rs` pins unsupported surface). These
    * TPC-H adaptations are blocked by the driver's synthetic schema, not
    * by engine capability. */
  def skipList: Map[String, String] = Map(
    // q2/q11/q16/q20 left this list in round 8: partsupp is now a
    // deterministic derivation shared with the oracle
    // (queries/Relational.scala `partsupp`), closing the last four
    // TPC-H shapes.
    "avro_scan" ->("environment-blocked: spark-avro is a separate jar not " +
      "in /opt/spark/jars and the build has zero egress; the reference " +
      "reads Avro via its listing-table machinery (README.md:49). The " +
      "CSV/JSON/Parquet/Arrow-IPC sources cover the same scan surface. " +
      "Re-checked round 15: a filesystem-wide search found no " +
      "spark-avro jar in any local ivy/coursier cache either."),
    "s3_object_store" -> ("environment-blocked: the reference registers " +
      "S3/HTTP object stores (core/src/object_store.rs:54-129); Spark's " +
      "equivalent is the s3a:// FileSystem, but hadoop-aws is not in " +
      "/opt/spark/jars and the container has no egress. The path-based " +
      "source surface is identical to the local-file reads tested in " +
      "SourcesSpec — only the FileSystem scheme differs. Re-checked " +
      "round 15: no hadoop-aws jar exists anywhere on the box."))
}
