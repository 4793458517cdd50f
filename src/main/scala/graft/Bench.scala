package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every declared query
  * on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Queries are forced through the `noop` sink, not `.count()`: count()
  * lets Catalyst prune every computed column (a projection-only query
  * would benchmark an empty scan), noop executes the full plan exactly
  * as a real consumer would.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2); the
  * reported per-query number is the MIN across runs and the raw runs are
  * carried in a `runs` field — so one contended run can neither
  * masquerade as a real regression nor mask one. The Spark SQL cache is
  * cleared before EVERY run: several operators persist() their
  * multi-consumer signature stages, and a warm cache would let run 2
  * skip the signature computation entirely (an artificially fast,
  * dishonest min).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first timed query isn't charged for it
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to math.max(1, nRuns)).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      // a fast FAILURE must not become the reported min; if every run
      // failed, report the slowest elapsed so the breakage is visible
      // in the headline number, not hidden by a near-zero time
      val good = runs.filter(_._2).map(_._1)
      val t = if (good.nonEmpty) good.min else runs.map(_._1).max
      (name, t, runs.map(_._1))
    }
    spark.catalog.clearCache()
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val raw = results
      .map { case (k, _, rs) => "\"" + k + "\":" + rs.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$raw,"n_runs":$nRuns,"sf":"$sfDir"}""")
    spark.stop()
  }
}
