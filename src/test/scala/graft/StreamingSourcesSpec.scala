package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** File-based streaming source coverage: the events table replayed as a
  * file stream (the production shape: new parquet files land in a
  * directory, the query incrementally aggregates them).
  */
class StreamingSourcesSpec extends SparkSpec {

  test("parquet file stream: incremental per-type counts match batch") {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    // stage the batch data as the stream's backing directory
    val batch = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("src_counts")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("src_counts").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = batch.groupBy("event_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed === expected)
    } finally q.stop()
  }
}
