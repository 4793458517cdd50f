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

  test("dd15: index-build cap drops boilerplate probes, organic probes unaffected") {
    import org.apache.spark.sql.functions.{col, lit}
    val corpus = DataPipeline.cappedDocs(spark, sf)
    val boilerText = corpus.filter(col("doc_id") >= 1000000L)
      .select("text").head.getString(0)
    val organicText = corpus.filter(col("doc_id") === 7L)
      .select("text").head.getString(0)
    val batch = spark.range(5)
      .select((col("id") + 2000000L).as("doc_id"), lit(boilerText).as("text"))
      .unionByName(spark.range(1)
        .select(lit(2000100L).as("doc_id"), lit(organicText).as("text")))
    val dedup = graft.operators.Dedup
    val capped = dedup.incrementalNearDup(batch, corpus,
      dedup.minhashBands(corpus, maxBucket = DataPipeline.CapMax))
    val uncapped = dedup.incrementalNearDup(batch, corpus,
      dedup.minhashBands(corpus, maxBucket = 100000))
    // each of the 5 boiler probes pairs with all CapN corpus boilers
    // when the index is uncapped; at the declared cap the boiler
    // buckets were dropped AT INDEX BUILD, so probes find nothing
    assert(uncapped.filter("da >= 1000000").count()
      === 5L * DataPipeline.CapN)
    assert(capped.filter("da >= 1000000").count() === 0L)
    // the organic clone still finds its corpus twin either way
    assert(capped.filter("da = 7 AND db = 2000100").count() === 1L)
    assert(uncapped.filter("da = 7 AND db = 2000100").count() === 1L)
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
