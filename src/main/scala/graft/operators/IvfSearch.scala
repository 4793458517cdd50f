package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions.cosine_similarity

/** IVF (inverted-file) approximate nearest neighbor search: a coarse
  * k-means quantizer partitions the corpus into `nClusters` cells; a
  * query scans only its `nProbe` nearest cells.
  *
  * Spark-first composition: the quantizer is MLlib KMeans (distributed,
  * deterministic with a fixed seed), the cell assignment lives as a
  * plain column, and the probe is an equi-join on the cell id — so
  * corpus work per query scales with `nProbe/nClusters` of the data,
  * not with corpus size. Centroids are O(nClusters * dim) — driver-safe
  * by construction at any corpus scale.
  */
object IvfSearch {

  def ivfTopK(
      embeddings: DataFrame,
      queryIds: Seq[Long],
      k: Int = 10,
      nClusters: Int = 16,
      nProbe: Int = 4,
      fitSampleRows: Int = 4096,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.ml.functions.array_to_vector

    // NOT cached: the result plan is lazy, so a cache here could never be
    // safely unpersisted (it would pin the whole corpus in executor
    // memory). The corpus appears twice in the final plan (query lookup +
    // probe scan); cell assignment is 16 centroid distances per row —
    // cheaper to recompute than to pin. At corpus scale you'd materialize
    // the assignment once as a bucketed table instead.
    val e = embeddings.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("features", array_to_vector(col("v")))

    // Fit the coarse quantizer on a bounded deterministic sample: cell
    // quality needs ~1000x nClusters points, not the corpus — at 100 TB
    // the 5 Lloyd iterations would otherwise be 5 full corpus passes.
    // (orderBy the id keeps the sample stable across partitionings; the
    // limit collapses to a TakeOrdered, not a full sort.)
    // random init (seeded): kmeans|| would run ~2 extra distributed
    // rounds per init step for a quantizer whose cells only need to be
    // roughly balanced — Lloyd refinement does the real work
    val fitSet = e.orderBy(col(idCol)).limit(fitSampleRows).cache()
    val km = new KMeans().setK(nClusters).setSeed(42).setMaxIter(5)
      .setInitMode("random")
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(fitSet)
    fitSet.unpersist()
    val assigned = model.transform(e).select(col(idCol), col("v"), col("cell"))

    // centroid table (tiny by construction) for query->cell ranking
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toSeq.toDF("cell", "centroid")

    val q = assigned.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("v").as("qv"))
    // rank each query's cells by centroid similarity, keep nProbe
    val wCell = Window.partitionBy("qid").orderBy(col("csim").desc, col("cell"))
    val probeCells = q.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine_similarity(col("qv"), col("centroid").cast("array<double>")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= nProbe)
      .select("qid", "qv", "cell")

    // probe: equi-join on the cell id — scans nProbe/nClusters of corpus
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col(idCol))
    probeCells.join(assigned, "cell")
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim", round(cosine_similarity(col("qv"), col("v")), 4))
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col(idCol), col("sim"))
      .orderBy("qid", "rnk")
  }
}
