package graft
import java.nio.file.{Files, Paths}

/** Benchmark main. Per VERDICT r1 methodology fixes:
  *  - noop sink (keeps ORDER BY / final project in the measured plan;
  *    `.count()` let Catalyst eliminate the global sort),
  *  - one warmup pass before the measured pass (JIT/codegen warm),
  *  - failures surface as "errors" in the JSON instead of fake timings,
  *  - JSON line printed bare AND written to SPARK_GRAFT_BENCH_OUT if set.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)

    // Steady-state protocol (VERDICT r4): some operators persist
    // intermediates they cannot unpersist under the lazy per-query
    // contract (d03's signature table, ParallelWindow's bucketed input).
    // Without a flush, those tables accumulate across the 170+ queries
    // sharing this JVM and the d-family timings measure cache pressure,
    // not the operator. Clear between queries so each timing starts from
    // an empty cache.
    def runOne(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      spark.catalog.clearCache()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }

    // Dev aid: SPARK_GRAFT_ONLY=q1_agg,d03_... limits the run (driver unset).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // Warmup: full pass (JIT + codegen cache + parquet footer cache).
    names.foreach { n =>
      try runOne(SparkEntry.queries(n))
      catch { case e: Throwable => errors(n) = e.getClass.getSimpleName }
    }
    val results = names.filterNot(errors.contains).map { n =>
      val t0 = System.nanoTime()
      try { runOne(SparkEntry.queries(n)) }
      catch { case e: Throwable => errors(n) = e.getClass.getSimpleName }
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = names.filterNot(errors.contains)
      .map(k => "\"" + k + "\":" + f"${results(k)}%.3f").mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val total = results.values.sum
    val out =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(out)
    // sbt wraps stdout in "[info] " prefixes (r1 driver got parsed:null),
    // so always leave a machine-readable copy on disk too.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/bench_out.json")
    Files.writeString(Paths.get(outPath), out + "\n")
    spark.stop()
  }
}
