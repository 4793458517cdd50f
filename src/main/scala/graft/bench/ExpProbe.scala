package graft.bench

import org.apache.spark.sql.SparkSession

/** Dev-only scratch A/B probe for optimization experiments. */
object ExpProbe {
  def main(args: Array[String]): Unit = {
    def mkSession(aqe: Boolean, parts: Int): SparkSession = {
      val b = SparkSession.builder()
        .appName(s"exp-aqe$aqe-p$parts").master("local[32]")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
      b.getOrCreate()
    }
    var spark = mkSession(aqe = true, 32)
    spark.sparkContext.setLogLevel("ERROR")
    def bench(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach(_ => f) // warm
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"[exp] $label: ${(System.nanoTime() - t0) / 1e9 / 20 * 1000}%.1f ms/op")
    }
    bench("AQE on  p32 groupBy job") {
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
    }
    bench("AQE on  p32 2-shuffle job") {
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .selectExpr("count % 3 as j", "count").groupBy("j").count()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
    spark = mkSession(aqe = false, 32)
    spark.sparkContext.setLogLevel("ERROR")
    bench("AQE off p32 groupBy job") {
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
    }
    bench("AQE off p32 2-shuffle job") {
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .selectExpr("count % 3 as j", "count").groupBy("j").count()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
    spark = mkSession(aqe = true, 8)
    spark.sparkContext.setLogLevel("ERROR")
    bench("AQE on  p8  groupBy job") {
      spark.range(1000).selectExpr("id % 7 as k").groupBy("k").count()
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
