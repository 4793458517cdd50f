package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class RelationalSpec extends SparkSpec {

  test("every declared query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("approx_count_distinct within default rsd of exact") {
    // raw HLL estimate vs exact (the query itself now folds this into the
    // oracle-checked hll_ok predicate at a looser 15%; pin 10% here)
    val rows = graft.sources.Tables.orders(spark, sf)
      .groupBy("o_orderstatus")
      .agg(approx_count_distinct("o_custkey").as("approx"),
        countDistinct("o_custkey").as("exact"))
      .collect()
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.1,
        s"approx $approx vs exact $exact")
    }
    val out = SparkEntry.queries("q10b_approx_distinct")(spark, sf).collect()
    assert(out.forall(_.getInt(2) == 1), "hll_ok must hold on testdata")
  }

  test("as-of join picks latest at-or-before value, null when none") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, t("2024-01-01 10:00:00"), 100L),
      (1L, t("2024-01-01 12:00:00"), 101L),
      (2L, t("2024-01-01 09:00:00"), 200L))
      .toDF("user_id", "ts", "event_id")
      .select("event_id", "user_id", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), 1.0),
      (1L, t("2024-01-01 11:00:00"), 2.0),
      (1L, t("2024-01-01 12:00:00"), 3.0), // equal ts -> inclusive
      (2L, t("2024-01-01 09:30:00"), 9.0)) // after left -> no match
      .toDF("user_id", "ts", "value")
    val out = AsOfJoin.lastAtOrBefore(left, right, "user_id", "ts", "ts", "value", "v")
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.get(3)).map(_.asInstanceOf[Double])).toSeq
      === Seq(Some(1.0), Some(3.0), None))
  }

  test("as-of join skips NULL right values (documented semantics) — struct-wrap carries them") {
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
      .select("event_id", "user_id", "ts")
    // latest right row at-or-before has a genuine NULL value
    val right = Seq(
      (1L, t("2024-01-01 09:00:00"), Some(1.0)),
      (1L, t("2024-01-01 11:00:00"), None: Option[Double]))
      .toDF("user_id", "ts", "value")
    // documented: the NULL row is indistinguishable from absence ->
    // the older non-NULL 1.0 is carried, NOT the latest row's NULL
    val skipped = AsOfJoin.lastAtOrBefore(left, right, "user_id", "ts", "ts", "value", "v")
      .collect()
    assert(Option(skipped.head.get(3)) === Some(1.0))
    // workaround from the scaladoc: presence-struct wrap makes every
    // right row non-NULL at the slot level, so the latest row wins and
    // its inner NULL is preserved after unwrap
    val wrapped = right.withColumn("value", struct(col("value")))
    val carried = AsOfJoin.lastAtOrBefore(left, wrapped, "user_id", "ts", "ts", "value", "v")
      .select(col("event_id"), col("v.value").as("v"))
      .collect()
    assert(Option(carried.head.get(1)) === None,
      "struct-wrapped join must carry the latest row's inner NULL")
  }

  test("oracle SQL map covers exactly the SQL-expressible queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    val rowsOnly = qs -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set.empty[String])
  }

  test("q24 SCD2: intervals chain per user, last version is current") {
    val out = graft.SparkEntry.queries("q24_scd2_intervals")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      // already ordered by (valid_from_us, event_id) within the dump
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) === b.getLong(3),
            s"version chain broken: ${a} -> ${b}")
          assert(a.getInt(5) === 0, s"non-last version marked current: $a")
        case _ =>
      }
      val last = rows.last
      assert(last.getLong(4) === -1L && last.getInt(5) === 1,
        s"last version must be open-ended and current: $last")
    }
  }
}
