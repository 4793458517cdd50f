package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only: writes the formatted physical plan of every declared query
  * (or a comma-separated subset) to <outDir>/<name>_<suffix>.txt so plan
  * claims in OPTIMIZATION notes are checkable without running Spark.
  *
  * Usage: runMain graft.bench.PlanDump <outDir> <suffix> [q1,q2,...]
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1) like the bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r19")
    val suffix = if (args.length > 1) args(1) else "before"
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("plan-dump").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    var nOk = 0
    names.foreach { name =>
      try {
        spark.catalog.clearCache()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        nOk += 1
      } catch {
        case e: Exception =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    println(s"[plandump] wrote $nOk/${names.size} plans to $outDir (_$suffix)")
    spark.stop()
  }
}
