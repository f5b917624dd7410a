package graft.search

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The {!knn} dense-vector qparser: local-param parsing and the
  * exact cosine topK contract, including Solr 9.1 pre-filtering. */
class KnnQuerySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(1.0f, 1.0f), 1),
      (4L, Seq(-1.0f, 0.0f), 1),
      (5L, Seq(0.9f, 0.1f), 2)
    ).toDF("vec_id", "embedding", "label")
  }

  test("parse: both param orders, required params enforced") {
    val r = KnnQuery.parse("{!knn f=embedding topK=3}[0.5, -1.25, 2]")
    assert(r === KnnQuery.KnnRequest("embedding", 3, Seq(0.5, -1.25, 2.0)))
    assert(KnnQuery.parse("{!knn topK=7 f=v}[1]") ===
      KnnQuery.KnnRequest("v", 7, Seq(1.0)))
    intercept[RuntimeException](KnnQuery.parse("{!knn f=v}[1]"))       // no topK
    intercept[RuntimeException](KnnQuery.parse("{!knn topK=3}[1]"))    // no f
    intercept[RuntimeException](KnnQuery.parse("{!knn f=v topK=3}[]")) // empty vec
    intercept[RuntimeException](KnnQuery.parse("v:[1 TO 2]"))          // not knn
  }

  test("search: exact cosine order with (score desc, id) ties") {
    val got = KnnQuery.knn(df, "{!knn f=embedding topK=3}[1,0]", "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // cos vs [1,0]: id1=1.0, id5=0.993884, id3=0.707107, id2=0.0, id4=-1.0
    assert(got.map(_._1) === Seq(1L, 5L, 3L))
    assert(got.head._2 === 1.0)
    assert(math.abs(got(2)._2 - 0.707107) < 1e-9)
  }

  test("pre-filter applies BEFORE the topK cut") {
    // labels {1,2} only; topK=2 must come from the filtered set
    val got = KnnQuery.knn(df, "{!knn f=embedding topK=2}[1,0]", "vec_id",
        fq = Some("label:[1 TO *]"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 3L)) // id1 (label 0) excluded despite cos=1.0
  }
}
