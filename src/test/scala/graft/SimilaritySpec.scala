package graft

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sf).cache()
  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  private def neighborSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("labelNoiseScreen: planted mislabel disagrees with its neighborhood") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0, 0.0), 0), (1L, Array(0.9, 0.1), 0),
      (2L, Array(0.95, 0.05), 1), // mislabeled member of cluster A
      (3L, Array(0.0, 1.0), 2), (4L, Array(0.1, 0.9), 2),
      (5L, Array(0.05, 0.95), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoiseScreen(df, queryIds = Seq(2L, 4L), k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(2L) === ((1, 0, 2L, false)), "both neighbors vote label 0")
    assert(out(4L) === ((2, 2, 2L, true)))
  }

  test("labelNoiseScreen: IVF pair frame with full probe reproduces the brute screen") {
    val qs = (0L until 20L).toSeq
    val brute = Similarity.labelNoiseScreen(emb, qs, k = 5)
      .orderBy("qid").collect().toSeq
    val ivfPairs = graft.operators.IvfSearch.ivfTopK(
      emb, queryIds = qs, k = 5, nClusters = 4, nProbe = 4)
    val viaIvf = Similarity.labelNoiseScreen(emb, qs, k = 5,
        pairs = Some(ivfPairs))
      .orderBy("qid").collect().toSeq
    assert(viaIvf === brute && brute.nonEmpty)
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val bf = Similarity.bruteForceTopK(emb, qids)
    val byQ = bf.collect().groupBy(_.getLong(0))
    assert(byQ.keySet === qids.toSet)
    byQ.values.foreach { rows =>
      assert(rows.length === 10)
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }) // descending
    }
  }

  test("LSH near-dup pairs: sound vs brute force, planted dup found") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // soundness on real data: every reported pair is a true > 0.45 pair
    // (candidates are exactly verified, so this must hold by construction)
    val lshPairs = Similarity.lshNearDupPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brutePairs = graft.operators.Dedup.embeddingNearDup(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs.subsetOf(brutePairs))
    assert(lshPairs.nonEmpty)
    // planted near-identical vectors (cos ~ 0.9995) must be found: at that
    // angle all 64 sign bits almost surely agree -> same buckets
    val base = Array.tabulate(64)(i => math.sin(i * 0.7) + 0.1)
    val near = base.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.02 else 0.0) }
    val far = Array.tabulate(64)(i => math.cos(i * 1.3) - 0.2)
    val df = Seq((1L, base.toSeq), (2L, near.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val found = Similarity.lshNearDupPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L)))
  }

  test("wide-band LSH (128x16): sound vs brute, scaled copy found, banding checked") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // a x1.001-scaled copy has cosine exactly 1 and a BIT-IDENTICAL
    // signature (sign(v.h) is scale-invariant), so every band matches
    // and recall of the planted pair is certain, not probabilistic
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val planted = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("vec_id"),
        expr("transform(embedding, x -> x * 1.001d)").as("embedding"))
    val wide = Similarity.lshNearDupPairs(base.unionByName(planted),
        nBits = 128, bandBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { i =>
      assert(wide.contains((i, i + 10000L)), s"planted copy of $i missing")
    }
    // precision is exact: every non-planted pair must be a true brute pair
    val brutePairs = graft.operators.Dedup.embeddingNearDup(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wide.filter(p => p._1 < 10000 && p._2 < 10000)
      .subsetOf(brutePairs))
    // bad banding rejected
    intercept[IllegalArgumentException] {
      Similarity.lshNearDupPairs(base, nBits = 100, bandBits = 16)
    }
  }

  test("LSH bucket-occupancy metrics observable; saturated buckets bounded and dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val base = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    // 30 bit-identical copies of vector 0 (scale invariance) saturate
    // every band bucket the original occupies past maxBucket=20
    val clones = base.filter(col("vec_id") === 0)
      .crossJoin(spark.range(1, 31).toDF("k"))
      .select((col("k") + 20000L).as("vec_id"),
        expr("transform(embedding, x -> x * 1.001d)").as("embedding"))
    val pairs = Similarity.lshNearDupPairs(base.unionByName(clones),
      maxBucket = 20)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the saturated clone block must be dropped entirely (cap bound) —
    // clone-clone and 0-clone pairs all ride over-cap buckets
    assert(!got.exists(p => p._1 >= 20000L || p._2 >= 20000L),
      "over-cap clone bucket leaked pairs through the cap")
    // occupancy metrics ride the executed plan (the dd5c banding-policy
    // observability): every band the clones occupy reports dropped
    val m = pairs.queryExecution.observedMetrics("graft.lsh.bucket_occupancy")
    val (nBuckets, nDropped, nNearCap) =
      (m.getLong(0), m.getLong(1), m.getLong(2))
    assert(nBuckets > 0L)
    // the 8 clone buckets (one per band) are dropped for certain;
    // structured organic sign patterns may add collateral drops
    assert(nDropped >= 8L,
      s"clone saturation must drop all 8 clone band buckets, got $nDropped")
    assert(nNearCap >= 0L)
    // cap-disable idiom stays valid (r19 keepFor clamp): Int.MaxValue
    // used to overflow BoundedDocsAgg's cap+1 into a negative maxKeep
    val uncapped = Similarity.lshNearDupPairs(base.unionByName(clones),
      maxBucket = Int.MaxValue)
    assert(uncapped.count() >= pairs.count())
  }

  test("bands: hand-computed packing at 8 and 16 bits") {
    val bits = Array(1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 1)
    assert(graft.functions.TextHashing.bands(bits, 8).toSeq === Seq(0xB2, 0x01))
    assert(graft.functions.TextHashing.bands(bits, 16).toSeq === Seq(0xB201))
    assert(graft.functions.TextHashing.byteBands(bits).toSeq === Seq(0xB2, 0x01))
    intercept[IllegalArgumentException] {
      graft.functions.TextHashing.bands(bits, 5)
    }
  }

  test("LSH top-k achieves useful recall against brute force") {
    val bf = neighborSet(Similarity.bruteForceTopK(emb, qids))
    val lsh = neighborSet(Similarity.lshTopK(emb, qids))
    val recalls = qids.map { q =>
      val found = lsh.getOrElse(q, Set.empty)
      (bf(q) intersect found).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    // Candidate set is ~15% of the corpus (37/256 probe buckets); recall
    // must clearly beat that baseline even on near-orthogonal data.
    assert(mean >= 0.3, s"mean recall@10 too low: $mean (per-query $recalls)")
  }

  test("IVF top-k achieves useful recall against brute force") {
    val bf = neighborSet(Similarity.bruteForceTopK(emb, qids))
    val ivf = neighborSet(graft.operators.IvfSearch.ivfTopK(emb, qids))
    val recalls = qids.map { q =>
      (bf(q) intersect ivf.getOrElse(q, Set.empty)).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    // probes 4/16 cells (~25% of corpus); recall should beat that baseline
    assert(mean >= 0.3, s"mean IVF recall@10 too low: $mean (per-query $recalls)")
  }

  test("IVF centroids persist as a release artifact; prebuilt path matches the fit path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.IvfSearch
    val e = graft.operators.Dedup.spread(emb
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("v")))
      .as[(Long, Array[Double])]
    val fit = IvfSearch.fitCentroids(e, nClusters = 16, lloydIter = 3, fitSampleMod = 1)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").resolve("centroids.bin")
    IvfSearch.saveCentroids(fit, path)
    val loaded = IvfSearch.loadCentroids(path)
    assert(loaded.length === fit.length)
    assert(loaded.zip(fit).forall { case (a, b) => a.sameElements(b) },
      "bit-exact round-trip (cell order is index identity)")
    val cold = neighborSet(IvfSearch.ivfTopK(emb, qids))
    val warm = neighborSet(IvfSearch.ivfTopK(emb, qids, prebuiltCentroids = Some(loaded)))
    assert(warm === cold, "prebuilt quantizer reproduces the fit path exactly")
  }

  test("mix32 matches the DuckDB positive-modulo mirror for negative and positive ids") {
    import spark.implicits._
    // The SQL mirrors compute h0 = ((x % m + m) % m) because DuckDB's %
    // takes the dividend's sign; the engine uses pmod. Scala's % has
    // the same dividend-sign semantics as DuckDB's, so replaying the
    // mirror chain verbatim here checks exactly the claimed parity —
    // including ids the fixtures never produce (negative, Long.MinValue).
    def mirror(x: Long): Long = {
      val m = 4294967296L
      val h0 = (x % m + m) % m
      val m1 = h0 ^ (h0 >> 16)
      val m2 = (m1 * 40503L) % m
      m2 ^ (m2 >> 13)
    }
    val ids = Seq(-1L, -2L, -4294967296L, -4294967297L, Long.MinValue,
      Long.MaxValue, 0L, 1L, 12345L, -987654321L)
    val engine = ids.toDF("id")
      .select(graft.operators.IvfSearch.mix32(org.apache.spark.sql.functions.col("id")))
      .collect().map(_.getLong(0))
    assert(engine.toSeq === ids.map(mirror),
      "mix32 column diverges from the positive-modulo SQL mirror")
  }

  test("semanticDedup: planted copies drop, originals survive, one row per vector") {
    import org.apache.spark.sql.functions._
    // plant exact copies of vec_ids 0..9 at 5000+: identical vectors
    // land in the identical cell, cosine 1.0 > any threshold, and the
    // copy (higher id) must be the dropped side
    val copies = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).unionByName(copies)
    val out = graft.operators.IvfSearch.semanticDedup(aug)
    assert(out.count() === aug.count(), "verdict must cover every input vector")
    val dropped = out.filter(!col("kept")).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert((5000L until 5010L).forall(dropped.contains),
      s"every planted copy must drop; dropped=$dropped")
    assert((0L until 10L).forall(id => !dropped.contains(id)),
      "originals (lower id of each pair) must survive")
  }

  test("semanticDedup: maxCellSize cap bounds pair work and over-cap rows are kept") {
    import org.apache.spark.sql.functions._
    val copies = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000L).as("vec_id"), col("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).unionByName(copies)
    // cap of 1: at most one participant per cell -> no pairs can form,
    // so even exact copies survive (conservatively KEPT, never dropped)
    val capped = graft.operators.IvfSearch.semanticDedup(aug, maxCellSize = 1)
    assert(capped.filter(!col("kept")).count() === 0L,
      "a cap of 1 leaves no pairable participants — nothing may drop")
  }

  test("randomProjection: hand-computed Achlioptas coefficients") {
    import spark.implicits._
    // R(0,0)=-1, R(1,0)=+1, R(0,1)=+1, R(1,1)=0 (mod-1000003/mod-3 chain)
    val emb = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.randomProjection(emb, k = 2).collect()(0)
    assert(r.getAs[Double]("p0") === 1.0) // 1*(-1) + 2*(+1)
    assert(r.getAs[Double]("p1") === 1.0) // 1*(+1) + 2*0
  }

  test("annRecall: self-recall is 1, partial overlap counts exactly") {
    import spark.implicits._
    val exact = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L), (1L, 1, 20L))
      .toDF("qid", "rnk", "vec_id")
    val self = graft.operators.Similarity.annRecall(exact, exact, k = 3)
      .orderBy("qid").as[(Long, Long, Double)].collect()
    assert(self === Array((0L, 3L, 1.0), (1L, 1L, 0.3333)))
    val approx = Seq((0L, 1, 10L), (0L, 2, 99L), (0L, 3, 12L), (1L, 1, 77L))
      .toDF("qid", "rnk", "vec_id")
    val part = graft.operators.Similarity.annRecall(exact, approx, k = 3)
      .orderBy("qid").as[(Long, Long, Double)].collect()
    assert(part === Array((0L, 2L, 0.6667), (1L, 0L, 0.0)))
  }

  test("annRecall: IVF panel recall against brute is high and bounded") {
    val emb = Tables.embeddings(spark, sf)
    val r = graft.operators.Similarity.annRecall(
      graft.operators.Similarity.bruteForceTopK(emb, Seq(0L, 1L, 2L, 3L, 4L)),
      graft.operators.IvfSearch.ivfTopK(emb, Seq(0L, 1L, 2L, 3L, 4L)), 10)
      .collect().map(_.getAs[Double]("recall_at_10"))
    assert(r.length === 5)
    assert(r.forall(x => x > 0.0 && x <= 1.0), r.mkString(","))
  }

  test("matryoshkaAudit: hand-computed prefix mass and verdict count") {
    import spark.implicits._
    // v1: all mass in dim 1 -> mass 1.0; v2: uniform 64 dims -> 16/64 = 0.25
    val emb = Seq(
      (1L, (Seq(2.0f) ++ Seq.fill(63)(0.0f)), 7),
      (2L, Seq.fill(64)(1.0f), 7))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.matryoshkaAudit(emb, k = 16, minMass = 0.5)
      .collect()(0)
    assert(r.getAs[Long]("n_vecs") === 2L)
    assert(r.getAs[Long]("n_concentrated") === 1L) // only the spiked vector
    assert(r.getAs[Double]("min_mass") === 0.25)
    assert(r.getAs[Double]("max_mass") === 1.0)
  }

  test("randomProjection: deterministic under repartition, full width") {
    val emb = Tables.embeddings(spark, sf)
    val a = graft.operators.Similarity.randomProjection(emb, 8)
      .orderBy("vec_id").collect().map(_.toSeq)
    val b = graft.operators.Similarity.randomProjection(emb.repartition(5), 8)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(a.length === 500)
    assert(a.toSeq === b.toSeq)
  }

  test("hardNegatives: the positive band skips the nearest twin, counts it") {
    import spark.implicits._
    def v(x: Double) = x +: Seq.fill(63)(0.0)
    val df = Seq(
      (0L, v(0.0)),  // query
      (1L, v(0.1)),  // d2 = 0.01  -> 10_000 micro: POSITIVE, excluded
      (2L, v(1.0)),  // d2 = 1     -> 1_000_000: first hard negative
      (3L, v(2.0)))  // d2 = 4     -> 4_000_000: second
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(df, queryIds = Seq(0L),
        dupThreshMicro = 500000L, k = 10)
      .orderBy("rnk").as[(Long, Int, Long, Long, Long)].collect()
    assert(out === Array(
      (0L, 1, 2L, 1000000L, 1L),
      (0L, 2, 3L, 4000000L, 1L)))
    // threshold 0 -> nothing is positive, the twin ranks first
    val all = Similarity.hardNegatives(df, queryIds = Seq(0L),
        dupThreshMicro = 0L, k = 10)
      .orderBy("rnk").as[(Long, Int, Long, Long, Long)].collect()
    assert(all.head === ((0L, 1, 1L, 10000L, 0L)) && all.length === 3)
  }
}
