package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming scenarios S7-S10 (FIXTURES.md B.2): event-time windows,
  * watermark late-data semantics, stateful dedup, stream-stream join.
  * All driven through MemoryStream micro-batches so watermark
  * progression is controlled batch by batch.
  */
class StreamingWindowsSpec extends SparkSpec {

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("S7: tumbling window + watermark drops late data") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .count()
      .select(col("window.start").as("ws"), col("k"), col("count"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("s7").start()
    try {
      input.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:30:00"), "a"))
      q.processAllAvailable()
      // advance watermark past 11:00 -> [10:00,11:00) finalizes with 2
      input.addData((t("2024-01-01 11:30:00"), "a"))
      q.processAllAvailable()
      // LATE: 10:15 is far behind the watermark (11:20) -> dropped
      input.addData((t("2024-01-01 10:15:00"), "a"))
      q.processAllAvailable()
      // advance watermark past 12:00 -> [11:00,12:00) finalizes with 1
      input.addData((t("2024-01-01 12:30:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("s7").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toMap
      assert(rows("2024-01-01 10:00:00.0") === 2) // late row NOT counted
      assert(rows("2024-01-01 11:00:00.0") === 1)
    } finally q.stop()
  }

  test("S8: sliding and session windows") {
    import spark.implicits._
    // sliding: 10-minute windows every 5 minutes -> each event lands in 2
    val input = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .count()
    val q = agg.writeStream.outputMode("append").format("memory").queryName("s8a").start()
    try {
      input.addData((t("2024-01-01 10:02:00"), "a"), (t("2024-01-01 10:04:00"), "a"))
      q.processAllAvailable()
      input.addData((t("2024-01-01 11:00:00"), "a")) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("s8a").collect()
        .map(r => (r.getStruct(0).getTimestamp(0).toString, r.getLong(1))).toMap
      assert(rows("2024-01-01 09:55:00.0") === 2)
      assert(rows("2024-01-01 10:00:00.0") === 2)
    } finally q.stop()

    // session windows: 30-minute gap closes a session
    val in2 = MemoryStream[(Timestamp, String)](spark, numPartitions = 1)
    val agg2 = in2.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "30 minutes"), col("k"))
      .count()
    val q2 = agg2.writeStream.outputMode("append").format("memory").queryName("s8b").start()
    try {
      in2.addData((t("2024-01-01 10:00:00"), "a"), (t("2024-01-01 10:20:00"), "a"),
        (t("2024-01-01 12:00:00"), "a")) // > 30min gap -> second session
      q2.processAllAvailable()
      in2.addData((t("2024-01-01 14:00:00"), "a")) // advance watermark
      q2.processAllAvailable()
      val counts = spark.table("s8b").collect().map(_.getLong(2)).sorted.toSeq
      assert(counts === Seq(1L, 2L)) // session of 2, then session of 1
    } finally q2.stop()
  }

  test("S9: stateful dedup with watermark") {
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long)](spark, numPartitions = 1)
    val dedup = input.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id")
    val q = dedup.writeStream.outputMode("append").format("memory").queryName("s9").start()
    try {
      input.addData((t("2024-01-01 10:00:00"), 1L), (t("2024-01-01 10:01:00"), 2L))
      q.processAllAvailable()
      // duplicate id 1 in a later batch (within watermark) -> suppressed
      input.addData((t("2024-01-01 10:02:00"), 1L), (t("2024-01-01 10:03:00"), 3L))
      q.processAllAvailable()
      val ids = spark.table("s9").collect().map(_.getLong(1)).sorted.toSeq
      assert(ids === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("S10: stream-stream join with time-range condition") {
    import spark.implicits._
    val clicks = MemoryStream[(Timestamp, Long, Double)](spark, numPartitions = 1)
    val purchases = MemoryStream[(Timestamp, Long, Long)](spark, numPartitions = 1)
    val c = clicks.toDF().toDF("cts", "user", "value").withWatermark("cts", "10 minutes")
    val p = purchases.toDF().toDF("pts", "puser", "pid").withWatermark("pts", "10 minutes")
    val joined = p.join(c,
      col("puser") === col("user") &&
        col("cts") <= col("pts") && col("cts") >= col("pts") - expr("INTERVAL 1 HOUR"))
      .select(col("pid"), col("user"), col("value"))
    val q = joined.writeStream.outputMode("append").format("memory").queryName("s10").start()
    try {
      clicks.addData((t("2024-01-01 10:00:00"), 1L, 5.0), (t("2024-01-01 08:00:00"), 2L, 7.0))
      purchases.addData((t("2024-01-01 10:30:00"), 1L, 100L), (t("2024-01-01 10:30:00"), 2L, 200L))
      q.processAllAvailable()
      clicks.addData((t("2024-01-01 13:00:00"), 9L, 0.0)) // advance watermark
      purchases.addData((t("2024-01-01 13:00:00"), 9L, 999L))
      q.processAllAvailable()
      val rows = spark.table("s10").collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
      assert(rows.get(100L) === Some(5.0)) // click within the hour before
      assert(!rows.contains(200L)) // user 2's click was 2.5h earlier -> no match
    } finally q.stop()
  }

  /** Cross-surface pin: Structured Streaming's native `session_window`
    * over micro-batches produces the SAME sessions as the batch
    * window-function form ([[graft.operators.EventAnalytics.sessionize]])
    * on the full fixture — session state merges correctly across the
    * batch boundary mid-stream. (Boundary semantics differ only at a
    * gap of EXACTLY 30:00.000000, which organic µs data never hits.)
    */
  test("S8b: streaming session_window agrees with batch sessionize") {
    import spark.implicits._
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_id"), col("value"))
      .as[(Timestamp, Long, Long, Double)].collect().toSeq
    val (c1, c2) = ev.sortBy(_._1.getTime).splitAt(ev.size / 2)
    val input = MemoryStream[(Timestamp, Long, Long, Double)](spark, numPartitions = 1)
    val agg = input.toDF().toDF("ts", "user_id", "event_id", "value")
      .withWatermark("ts", "40 days")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("start_us"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("s8b").start()
    try {
      input.addData(c1)
      q.processAllAvailable()
      input.addData(c2)
      q.processAllAvailable()
      // flush: a far-future sentinel pushes the watermark past everything
      input.addData(Seq((t("2030-01-01 00:00:00"), -1L, 0L, 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("s8b").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap.filter { case ((user, _), _) => user >= 0 }
      val batch = graft.operators.EventAnalytics
        .sessionize(graft.sources.Tables.events(spark, sf), 30)
        .select("user_id", "start_us", "n_events", "sum_value")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(streamed.size === batch.size)
      assert(streamed === batch)
    } finally q.stop()
  }
}
