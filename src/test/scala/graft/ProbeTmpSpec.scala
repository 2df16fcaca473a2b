package graft
import org.scalatest.funsuite.AnyFunSuite
class ProbeTmpSpec extends AnyFunSuite {
  test("probe") {
    val spark = GraftSession.builder(4, 32).appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    val p = SparkEntry.queries("d33_serving_pipeline")(spark, "/root/repo/target/sf10")
      .queryExecution.executedPlan.toString()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/d33_sf10_plan.txt"), p)
    println("WROTE " + p.length)
  }
}
