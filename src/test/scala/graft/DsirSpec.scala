package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** Pins [[Dsir.importanceResample]]: target-domain vocabulary scores
  * positive (its docs rank first), off-domain negative, null texts are
  * dropped without NPE, empty-token docs are absent, and the ranking
  * is reproducible — the contract the ds1 mirror hash-checks.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("docs sharing the target domain's vocabulary rank on top") {
    val docs = Seq(
      (0L, "quantum flux quantum torsion", true),
      (1L, "quantum flux entangle", true),
      (2L, "recipe butter flour sugar", false),
      (3L, "recipe flour butter salt", false),
      (4L, "quantum recipe", false) // mixed: target words, not a target doc
    ).toDF("doc_id", "text", "is_t")
    val top2 = Dsir.importanceResample(docs, isTarget = col("is_t"), topN = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top2 === Set(0L, 1L), s"got $top2")
    // full ranking: every target doc outscores every off-domain doc
    // (absolute scores are smoothing-shrunk on a tiny corpus — only the
    // ordering is the contract)
    val scores = Dsir.importanceResample(docs, isTarget = col("is_t"), topN = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Seq(0L, 1L).map(scores).min > Seq(2L, 3L, 4L).map(scores).max)
  }

  test("null and empty texts are dropped / absent, no NPE") {
    val docs = Seq(
      (0L, "alpha beta", true),
      (1L, null.asInstanceOf[String], false),
      (2L, "   ", false),
      (3L, "gamma delta", false)
    ).toDF("doc_id", "text", "is_t")
    val ids = Dsir.importanceResample(docs, isTarget = col("is_t"), topN = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(0L, 3L))
  }

  test("ranking is reproducible on the sf fixture") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = Dsir.importanceResample(docs, isTarget = col("lang") === "en",
      topN = 50).collect().toSeq
    val b = Dsir.importanceResample(docs, isTarget = col("lang") === "en",
      topN = 50).collect().toSeq
    assert(a === b)
    assert(a.size === 50)
  }
}
