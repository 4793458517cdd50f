package graft

import graft.operators.Clustering

/** Pins [[Clustering.kmeans]]'s determinism contract: first-k-ids
  * init, round-6 argmin with lower-cid tiebreaks, empty-cluster drop,
  * null/ragged-vector tolerance, and trajectory reproducibility (the
  * properties the cl1 DuckDB mirror replays CTE by CTE).
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Array[Double])]) =
    rows.toDF("vec_id", "embedding")

  test("two well-separated blobs are recovered exactly") {
    val pts = Seq(
      (0L, Array(0.0, 0.1)), (1L, Array(0.1, 0.0)), (2L, Array(0.05, 0.05)),
      (3L, Array(9.9, 10.0)), (4L, Array(10.0, 9.9)), (5L, Array(10.1, 10.1)))
    val out = Clustering.kmeans(df(pts), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(out(0L), out(1L), out(2L)).size === 1)
    assert(Set(out(3L), out(4L), out(5L)).size === 1)
    assert(out(0L) !== out(3L))
  }

  test("empty clusters are dropped, not re-seeded") {
    // seeds = ids 0,1,2; points live at two locations only, so after the
    // first mean update one seed-cluster has no members and vanishes
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
      (2L, Array(10.0, 10.0)), (3L, Array(10.0, 10.0)))
    val out = Clustering.kmeans(df(pts), k = 3, iters = 3)
    val clusters = out.select("cluster").distinct().as[Int].collect().toSet
    assert(clusters === Set(0, 2), "cluster 1 lost the tie at init and must vanish")
  }

  test("ties break toward the lower cluster id") {
    // the third point is exactly equidistant from both seeds
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(2.0, 0.0)), (2L, Array(1.0, 0.0)))
    val out = Clustering.kmeans(df(pts), k = 2, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(2L) === 0)
  }

  test("null embeddings are dropped; ragged vectors use the common prefix") {
    val pts = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
      (2L, Array(0.1, 0.1, 99.0)), // extra dim ignored vs 2-dim centroids
      (3L, null.asInstanceOf[Array[Double]]))
    val out = Clustering.kmeans(df(pts), k = 2, iters = 2)
    val ids = out.select("vec_id").as[Long].collect().toSet
    assert(ids === Set(0L, 1L, 2L), "null row absent, ragged row assigned")
    val c = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(c(2L) === c(0L), "prefix distance puts the ragged vector with blob 0")
  }

  test("clusterBalancedSample: per-cluster quota enforced, subset of kmeans") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val quota = 7
    val kept = Clustering.clusterBalancedSample(emb, quota = quota, k = 4)
    val rows = kept.collect()
    assert(rows.nonEmpty)
    // quota binds per cluster, rk is a contiguous 1..n hash-order rank
    val byCluster = rows.groupBy(_.getInt(1))
    byCluster.foreach { case (_, rs) =>
      assert(rs.length <= quota)
      assert(rs.map(_.getInt(3)).sorted.toSeq === (1 to rs.length))
    }
    // every kept row carries the kmeans assignment unchanged
    val base = Clustering.kmeans(emb, k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    rows.foreach { r =>
      assert(base(r.getLong(0)) === ((r.getInt(1), r.getDouble(2))))
    }
    // the full corpus exceeds the quota in at least one cluster, so the
    // pass actually drops rows (the fixture is big enough to bind)
    assert(rows.length < base.size)
  }

  test("clusterBalancedSample is stable under re-partitioning") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = Clustering.clusterBalancedSample(emb, quota = 5, k = 4)
      .orderBy("vec_id").collect().toSeq
    val b = Clustering.clusterBalancedSample(emb.repartition(13), quota = 5, k = 4)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }

  test("trajectory is reproducible across invocations (sf fixture)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = Clustering.kmeans(emb, k = 4, iters = 2).collect().toSeq
    val b = Clustering.kmeans(emb, k = 4, iters = 2).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("silhouetteAudit: hand-computed margins on two planted clusters") {
    import spark.implicits._
    // seeds = ids 0, 1 -> clusters at (0,0)-ish and (10,10)-ish after
    // one mean update. iters=2: means over the round-1 assignment.
    val df = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
      (2L, Array(1.0, 0.0)), (3L, Array(9.0, 10.0))).toDF("vec_id", "embedding")
    val out = Clustering.silhouetteAudit(df, k = 2, iters = 2)
      .orderBy("cluster").as[(Int, Long, Long)].collect()
    // final centroids: c0 = (0.5, 0), c1 = (9.5, 10).
    // every point: a = d2 to own, b = d2 to other, margin (b-a)/b:
    //   id0: a=0.25, b=190.25 -> (190.0/190.25)*1e6 -> 998686
    //   id2: a=0.25, b=172.25 -> 998549
    //   id1: a=0.25, b=190.25 -> 998686 ; id3: a=0.25, b=172.25 -> 998549
    def mic(a: Double, b: Double) = math.floor((b - a) / b * 1e6 + 0.5).toLong
    val c0 = (mic(0.25, 190.25) + mic(0.25, 172.25)) / 2
    assert(out === Array((0, 2L, c0), (1, 2L, c0)))
    assert(out.map(_._2).sum === 4L)
  }

  test("silhouetteAudit: coincident centroids yield zero margin (b = 0 edge)") {
    import spark.implicits._
    // all vectors identical; iters = 1 keeps BOTH (coincident) seed
    // centroids alive -> for every point d1 = d2 = 0 and the margin is
    // defined to 0. (iters = 2 would empty cluster 1 and drop it: with
    // one surviving centroid no second-nearest exists and every point
    // drops - the mirror's rn = 2 inner-join rule.)
    val df = (0L to 5L).map(i => (i, Array(3.0, 4.0))).toDF("vec_id", "embedding")
    val out = Clustering.silhouetteAudit(df, k = 2, iters = 1).collect()
    val dropped = Clustering.silhouetteAudit(df, k = 2, iters = 2).collect()
    assert(dropped.isEmpty, "single surviving centroid must drop all points")
    assert(out.map(_.getAs[Long]("n")).sum === 6L)
    assert(out.forall(_.getAs[Long]("mean_sil_micro") === 0L))
  }

  test("dbscan: hand-built clusters, border min-label tie, isolated core, noise") {
    // 2-D direction fixture, sims are cosines of angle differences.
    // Cluster A: 4 mutually-similar rays (each sees 3 neighbors ->
    // core); cluster B likewise, far from A; a border ray that sees
    // exactly one core from EACH cluster (2 neighbors < minPts 3,
    // min-label tie must pick A's cluster); one ray similar to nothing.
    def ray(deg: Double) = {
      val r = math.toRadians(deg); Array(math.cos(r), math.sin(r))
    }
    // acos(0.35) ~ 69.5 deg is the neighbor horizon: the border ray at
    // 81 deg sees EXACTLY the nearest member of each cluster (gap 69 ->
    // cos 0.358 > 0.35) and misses the next (gap 73 -> cos 0.292)
    val pts = Seq(
      (0L, ray(0)), (1L, ray(4)), (2L, ray(8)), (3L, ray(12)),          // A
      (10L, ray(150)), (11L, ray(154)), (12L, ray(158)), (13L, ray(162)), // B
      (20L, ray(81)),     // border: sees 3 (gap 69) and 10 (gap 69) only
      (30L, ray(260)))    // noise: > 69.5 deg from everything
    val out = Clustering.dbscan(df(pts)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    Seq(0L, 1L, 2L).foreach(i => assert(out(i) === ((3L, "core", 0L)), s"$i"))
    assert(out(3L) === ((4L, "core", 0L)))   // +1: sees the border too
    assert(out(10L) === ((4L, "core", 10L)))
    Seq(11L, 12L, 13L).foreach(i => assert(out(i) === ((3L, "core", 10L)), s"$i"))
    assert(out(20L) === ((2L, "border", 0L)),
      "border with cores in two clusters must take the min cluster label")
    assert(out(30L) === ((0L, "noise", -1L)))
    // isolated core: with minPts = 1 the noise ray pairs with nothing
    // and stays noise, while the border becomes a core whose component
    // spans both blobs (it bridges them)
    val loose = Clustering.dbscan(df(pts), minPts = 1).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(loose(30L) === (("noise", -1L)))
    assert(loose(20L)._1 === "core")
    assert((0L to 3L).map(loose(_)._2).toSet === Set(0L))
    assert(loose(10L)._2 === 0L, "bridge core must merge the components")
  }

  test("dbscan: roles all live on testdata; repartition-invariant; pairs injection matches") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val a = Clustering.dbscan(emb).orderBy("vec_id").collect().toSeq
    val roles = a.map(_.getString(2)).toSet
    assert(roles === Set("core", "border", "noise"),
      s"fixture parameters must keep every role live, got $roles")
    val b = Clustering.dbscan(emb.repartition(7)).orderBy("vec_id").collect().toSeq
    assert(a === b)
    // evidence-graph contract: an externally supplied pair frame (the
    // LSH path's shape) routes through identically
    val pairs = graft.operators.Dedup.embeddingNearDup(emb, threshold = 0.35)
    val c = Clustering.dbscan(emb, pairs = Some(pairs))
      .orderBy("vec_id").collect().toSeq
    assert(a === c)
  }

  test("dbscan: size-gated driver fast path == distributed tail (r19 parity pin)") {
    // the dd8/gr1 fast==loop discipline applied to the DBSCAN tail:
    // smallGraphMaxPairs = 0 forces the distributed keyed-agg path;
    // the default gate collects the (tiny) pair graph and runs the
    // verdict tail driver-side. Identical verdicts required on the
    // organic fixture (every role live) AND on the LSH evidence-graph
    // path, at both minPts settings.
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val fast = Clustering.dbscan(emb).orderBy("vec_id").collect().toSeq
    val loop = Clustering.dbscan(emb, smallGraphMaxPairs = 0)
      .orderBy("vec_id").collect().toSeq
    assert(fast === loop)
    assert(fast.map(_.getString(2)).toSet === Set("core", "border", "noise"))
    val lsh = graft.operators.Similarity.lshNearDupPairs(emb, threshold = 0.35)
    val fastL = Clustering.dbscan(emb, pairs = Some(lsh))
      .orderBy("vec_id").collect().toSeq
    val loopL = Clustering.dbscan(emb, pairs = Some(lsh), smallGraphMaxPairs = 0)
      .orderBy("vec_id").collect().toSeq
    assert(fastL === loopL)
    val fast1 = Clustering.dbscan(emb, minPts = 1).orderBy("vec_id").collect().toSeq
    val loop1 = Clustering.dbscan(emb, minPts = 1, smallGraphMaxPairs = 0)
      .orderBy("vec_id").collect().toSeq
    assert(fast1 === loop1)
  }
}
