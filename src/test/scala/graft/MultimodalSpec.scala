package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multimodal plumbing property the oracle can't see: the decode stage
  * initializes its (stubbed) codec ONCE PER PARTITION, not once per row —
  * the batch shape that makes a real image/audio decoder or model
  * affordable at 100 TB (init cost amortizes over the partition,
  * exactly like a Pandas-UDF batch).
  */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("decode pipeline initializes per partition, not per row") {
    val s = spark
    import s.implicits._
    val inits = spark.sparkContext.longAccumulator("codec_inits")
    val rows = spark.sparkContext.longAccumulator("rows_decoded")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .repartition(4)
    val nParts = docs.rdd.getNumPartitions
    val decoded = docs.as[(Long, Array[Byte])].mapPartitions { it =>
      inits.add(1) // a real pipeline opens the codec/model HERE
      it.map { case (id, payload) =>
        rows.add(1)
        (id, payload.length)
      }
    }
    val n = decoded.count()
    assert(inits.value == nParts,
      s"expected $nParts codec inits (one per partition), got ${inits.value}")
    assert(rows.value == n)
  }
}
