package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables

/** Source/sink format coverage beyond parquet+memory: csv and json
  * round-trips of engine query results, and the rate streaming source.
  */
class SourcesSinksSpec extends SparkSpec {

  test("csv sink/source round-trip of a query result") {
    val out = Files.createTempDirectory("graft-csv").toString
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() === df.count())
    assert(back.columns.sorted === df.columns.sorted)
  }

  test("json sink/source round-trip preserves rows") {
    val out = Files.createTempDirectory("graft-json").toString
    val df = SparkEntry.queries("q10_distinct")(spark, sf)
    df.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() === df.count())
  }

  test("rate source produces monotonically increasing rows") {
    val q = spark.readStream.format("rate").option("rowsPerSecond", "100").load()
      .writeStream.format("memory").queryName("rate_out")
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      val vals = spark.table("rate_out").select("value").collect().map(_.getLong(0))
      assert(vals.nonEmpty)
      assert(vals.sorted.sameElements(vals.distinct.sorted)) // unique, ordered domain
    } finally q.stop()
  }
}
