package graft.tools

/** Measures the ANN index BUILD cost that Bench's warmup discipline
  * deliberately hides (the measured passes time the probe, as
  * production would — so the build-side N×K→two-level win of round 15
  * needs its own instrument). Runs the v18 probe twice against a
  * given corpus dir: the first run builds the fingerprint-keyed index
  * artifact (trainer + corpus cell assignment + flat-agreement audit),
  * the second probes the published artifact — so t_build ≈ t1 − t2.
  * Fresh replicas get fresh fingerprints, so on a just-regenerated
  * scale corpus the first run is always a true cold build.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.AnnBuildTime <sfDir>"
  * Prints one JSON line: {"sf":…,"first_sec":…,"second_sec":…,"build_sec":…}
  */
object AnnBuildTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    def once(): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("v18_indexed_ann")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val t1 = once()
    val t2 = once()
    println(f"""{"sf":"$dir","first_sec":$t1%.3f,"second_sec":$t2%.3f,"build_sec":${t1 - t2}%.3f}""")
    spark.stop()
  }
}
