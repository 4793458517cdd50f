package graft

import graft.queries.DataPipeline

/** Proves the dd2/dd3 hot-key caps ENGAGE on the cap fixtures — i.e.
  * the `dd2_capped_minhash` / `dd3_capped_jaccard` oracle entries
  * exercise live cap code, not dead CTEs: with the cap raised above
  * the boilerplate block size the same input yields the full
  * CapN*(CapN-1)/2 boilerplate pair explosion; at the declared cap it
  * yields none of those pairs (and the organic base pairs are
  * untouched, because no organic key is hot).
  */
class CappedFixtureSpec extends SparkSpec {

  private val boilerPairs = DataPipeline.CapN.toLong * (DataPipeline.CapN - 1) / 2

  private def boilerCount(df: org.apache.spark.sql.DataFrame): Long =
    df.filter("da >= 1000000 AND db >= 1000000").count()

  test("dd2: minhash bucket cap drops the boilerplate block, keeps organic pairs") {
    val docs = DataPipeline.cappedDocs(spark, sf)
    val capped = graft.operators.Dedup.minhashLsh(docs, maxBucket = DataPipeline.CapMax)
    val uncapped = graft.operators.Dedup.minhashLsh(docs, maxBucket = 100000)
    assert(boilerCount(uncapped) === boilerPairs, "uncapped must emit the full block")
    assert(boilerCount(capped) === 0L, "capped must drop every boilerplate pair")
    // organic (non-boilerplate) pairs are identical either way
    assert(capped.filter("da < 1000000").collect().toSet
      === uncapped.filter("da < 1000000").collect().toSet)
    spark.catalog.clearCache()
  }

  test("dd3: shingle doc-frequency cap drops the boilerplate block, keeps organic pairs") {
    val docs = DataPipeline.cappedDocs(spark, sf)
    val capped = graft.operators.Dedup.ngramJaccard(docs, maxDocFreq = DataPipeline.CapMax)
    val uncapped = graft.operators.Dedup.ngramJaccard(docs, maxDocFreq = 100000)
    assert(boilerCount(uncapped) === boilerPairs, "uncapped must emit the full block")
    assert(boilerCount(capped) === 0L, "capped must drop every boilerplate pair")
    assert(capped.filter("da < 1000000").collect().toSet
      === uncapped.filter("da < 1000000").collect().toSet)
    spark.catalog.clearCache()
  }
}
