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
    if (args.length > 1 && args(1) == "--assign") assignOnly(spark, dir)
    else {
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
    }
    spark.stop()
  }

  /** Head-to-head of the one pass round 15 changed: flat N×K argmin
    * vs the two-level route, SAME corpus, SAME trained codebook (built
    * once first, untimed), materialized through the noop sink. This is
    * the direct evidence for the build-route decision — the full-build
    * number above folds in the (linear, unchanged) sampled trainer. */
  private def assignOnly(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    import graft.llm.Similarity
    val qvAll = Similarity.ivfQv(graft.Tables.load(spark, dir, "embeddings"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = qvAll.count()
    val k = math.round(math.sqrt(n.toDouble)).toInt
    val tTr0 = System.nanoTime()
    val cents = Similarity.ivfTrainSampled(qvAll, k, 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cents.count()
    val tTrain = (System.nanoTime() - tTr0) / 1e9
    def time(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val tTwo = time(Similarity.twoLevelAssign(qvAll, cents, k)
      .select(col("vec_id"), col("cid")))
    val tFlat = time(Similarity.ivfAssign(qvAll, cents)
      .select(col("vec_id"), col("cid")))
    println(f"""{"sf":"$dir","n":$n,"k":$k,"train_sec":$tTrain%.3f,"flat_assign_sec":$tFlat%.3f,"two_level_sec":$tTwo%.3f,"speedup":${tFlat / tTwo}%.2f}""")
  }
}
