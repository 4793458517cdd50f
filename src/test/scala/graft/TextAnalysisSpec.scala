package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Tables

class TextAnalysisSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf).cache()

  test("language id emits a known code per doc, deterministically") {
    val out = TextAnalysis.languageId(docs)
    val preds = out.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "de", "es", "fr", "zh", "und")))
    assert(out.count() === docs.count())
  }

  test("fingerprint matches the hand-computed rolling hash") {
    import spark.implicits._
    val df = Seq((7L, "ab cde")).toDF("doc_id", "text")
    // atoms: len*31 + ascii(first): "ab" -> 2*31+97 = 159; "cde" -> 3*31+99 = 192
    // fold: ((0*131+159)%p)*131 + 192 = 159*131+192 = 21021
    val fp = TextAnalysis.fingerprint(df).head.getLong(1)
    assert(fp === 159L * 131 + 192)
  }

  test("quality score is bounded and ratios are consistent") {
    val q = TextAnalysis.quality(docs)
    val bad = q.filter(col("quality_score") < 0 || col("quality_score") > 1).count()
    assert(bad === 0)
    assert(q.filter(col("n_stop") > col("n_words")).count() === 0)
  }

  test("multimodal stub pipeline: features derive from payload bytes") {
    implicit val s = spark
    import s.implicits._
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val f = Multimodal.extractFeatures(df).head()
    assert(f.n_bytes === 3)
    assert(f.n_chunks === 1)
    assert(f.head_hex === "616263".toUpperCase)
    assert(f.feature_vec.length === 4)
    assert(math.abs(f.feature_vec.sum - 1.0f) < 1e-6) // 'a','b','c' all in bucket 3
  }
}
