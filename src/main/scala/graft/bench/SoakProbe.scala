package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: run the three newest soak rows at x1 with full stack
  * traces (the soak harness greps its own output and ate the error).
  */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-soakprobe").toString
    ScaleSoak.synthDocs(spark, 5000L).repartition(32)
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val emb = {
      import spark.implicits._
      spark.range(2000L).as[Long]
        .map { id =>
          val v = Array.tabulate(64)(d =>
            (Math.floorMod(id * 64L + d, 2000L) - 1000L) / 1000.0)
          (id, v)
        }.toDF("vec_id", "embedding")
    }
    emb.write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val e = spark.read.parquet(s"$base/embeddings.parquet")
    val d = spark.read.parquet(s"$base/documents.parquet")
    def t(name: String)(f: => Long): Unit =
      try {
        spark.catalog.clearCache()
        val s = System.nanoTime; val n = f
        println(f"[probe] $name OK ${(System.nanoTime - s) / 1e9}%.2f s rows=$n")
      } catch {
        case ex: Throwable =>
          println(s"[probe] $name FAILED: ${ex.getClass.getName}: ${ex.getMessage}")
          ex.printStackTrace()
      }
    t("cl4_dbscan_lsh") {
      graft.operators.Clustering.dbscan(e, simThreshold = 0.35,
        pairs = Some(graft.operators.Similarity.lshNearDupPairs(
          e, threshold = 0.35))).count()
    }
    t("ann_ivfsq") {
      graft.operators.SqSearch.ivfSqTopK(e, queryIds = Seq(0L, 1L, 2L, 3L, 4L)).count()
    }
    t("mm_phash_pairs") {
      implicit val s = spark
      graft.operators.Multimodal.phashPairs(
        graft.operators.Multimodal.syntheticPatternImages(
          d.select(col("doc_id")))).count()
    }
    spark.stop()
  }
}
