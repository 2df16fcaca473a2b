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

  test("m08 scene cuts: a crafted energy jump yields exactly one cut; " +
    "uniform and single-frame payloads yield none") {
    val s = spark
    import s.implicits._
    // Frame energies under the fake decode: 'a'=97 → 97²·256 ≈ 2.41M,
    // 'z'=122 → 122²·256 ≈ 3.81M; the jump (≈1.4M) clears the 300k cut
    // threshold, equal frames and lone frames cannot.
    val docs = Seq(
      (1L, "a" * 512, "en"),
      (2L, "a" * 256 + "z" * 256, "en"),
      (3L, "b" * 100, "en")
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("m08corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.llm.Multimodal.queries("m08_scene_cuts")(spark, dir)
      .collect()
      .map(row => row.getLong(0) ->
        ((row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))))
      .toMap
    assert(r(1L) == ((2L, 0L, 1L, 2L)), s"uniform payload: ${r(1L)}")
    assert(r(2L) == ((2L, 1L, 2L, 1L)), s"energy jump: ${r(2L)}")
    assert(r(3L) == ((1L, 0L, 1L, 1L)), s"single frame: ${r(3L)}")
  }
}
