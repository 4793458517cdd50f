package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only forensic: per-query driver-job / stage / task / shuffle
  * counts plus warm wall time, for locating scheduling-constant costs
  * (the Cl4Probe/PplProbe pattern, generalized to any declared query).
  *
  * Usage: runMain graft.bench.JobProbe q1,q2,... [nRuns]
  * Reads SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names: Seq[String] =
      if (args.nonEmpty && args(0).nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val nRuns = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("job-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shuffleWrite = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        ()
      }
    })
    // warmup so JIT isn't charged to the first probed query
    spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[jobprobe] unknown query $name")
        case Some(fn) =>
          val times = (1 to nRuns).map { _ =>
            spark.catalog.clearCache()
            jobs.set(0); stages.set(0); tasks.set(0); shuffleWrite.set(0L)
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            val dt = (System.nanoTime() - t0) / 1e9
            // listener events are async; small settle so counts are stable
            Thread.sleep(200)
            (dt, jobs.get(), stages.get(), tasks.get(), shuffleWrite.get())
          }
          val best = times.minBy(_._1)
          println(f"[jobprobe] $name%-28s min ${best._1}%6.2f s  jobs ${best._2}%3d  stages ${best._3}%3d  tasks ${best._4}%5d  shufMB ${best._5 / 1e6}%8.1f  runs ${times.map(t => f"${t._1}%.2f").mkString("[", ",", "]")}")
      }
    }
    spark.stop()
  }
}
