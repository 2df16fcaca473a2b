package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.llm.Dedup

/** Property test for the chunk-level dedup pipeline (d10): on arbitrary
  * corpora drawn from a tiny vocabulary (maximizing chunk collisions —
  * the interesting case), the distributed hash-canonical pipeline must
  * agree with an in-memory brute force on every per-doc chunk and
  * duplicate count. The graded d10 entry checks one fixed corpus; this
  * pins the operator over the input space, including cross-doc AND
  * within-doc (stride-overlap) duplicate chunks.
  */
class DedupPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** In-memory reference: same chunk grid, canonical = min encoded
    * (doc_id, chunk_start) per chunk TEXT (md5 is injective wlog). */
  private def brute(docs: Seq[(Long, String)], chunk: Int,
                    stride: Int): Map[Long, (Long, Long)] = {
    // split(text, " ") in Spark keeps trailing empty strings → limit -1.
    val chunks = docs.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      (0 to math.max(toks.length - 1, 0) by stride).map { st =>
        (id, st.toLong, toks.slice(st, st + chunk).mkString(" "))
      }
    }
    val canon = chunks.groupBy(_._3)
      .map { case (txt, cs) => txt -> cs.map(c => c._1 * 100000 + c._2).min }
    docs.map { case (id, _) =>
      val mine = chunks.filter(_._1 == id)
      val nDup = mine.count(c => canon(c._3) != c._1 * 100000 + c._2)
      id -> (mine.size.toLong, nDup.toLong)
    }.toMap
  }

  test("distributed chunk dedup equals in-memory brute force") {
    val s = spark
    import s.implicits._
    val genCase = for {
      nDocs <- Gen.choose(3, 12)
      chunk <- Gen.choose(2, 6)
      stride <- Gen.choose(1, 5)
      docs <- Gen.sequence[Seq[(Long, String)], (Long, String)](
        (0 until nDocs).map { id =>
          for {
            n <- Gen.choose(1, 40)
            toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
          } yield (id.toLong, toks.mkString(" "))
        })
    } yield (docs, chunk, stride)

    val prop = Prop.forAll(genCase) { case (docs, chunk, stride) =>
      val got = Dedup.chunkDedup(docs.toDF("doc_id", "text"), chunk, stride)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      got == brute(docs, chunk, stride)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
