package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form — sessionization, ordered
  * funnels, cohort retention. The reference's stateful operators keep
  * exactly this kind of per-key event state imperatively
  * (reference stateful_operator.py `handle`/step batching); these are
  * the DECLARATIVE batch twins over the `events` table, planned so
  * Catalyst picks distributed window / keyed-join strategies instead
  * of a per-key interpreter loop.
  *
  * Scale shapes (100 TB events, keyed by user):
  *   - [[sessionize]]: ONE hash shuffle on `user_id`, then two
  *     user-partitioned window passes (lag + running sum) and a
  *     partial-agg rollup on (user, session). Nothing is globally
  *     sorted; a user's history sorts within its partition. Per-user
  *     event counts are human-bounded, so no salting is needed; a
  *     robotic hot key would bound one task's sort, not the stage.
  *   - [[funnel]]: filters to the step types FIRST (pushed to the
  *     parquet scan), then per-step keyed min-aggregations chained by
  *     equi-joins on `user_id` — every stage keyed identically, so AQE
  *     plans one co-partitioned exchange family; step frames shrink
  *     monotonically (stage k+1 only scans stage-k survivors).
  *   - [[retentionCohorts]]: per-user first-day via a user-keyed
  *     min-window, then a (cohort_week, week_offset) rollup —
  *     two shuffles total, output is cohort-grid sized (tiny).
  *
  * Determinism: timestamps are compared in integer MICROSECONDS
  * (`unix_micros` ↔ DuckDB `epoch_us`) and day arithmetic in integer
  * epoch days, so every mirror hash is exact — no float time math.
  * Output order unspecified (callers sort at the edge; see
  * [[Sampling]]'s contract note).
  */
object EventAnalytics {

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Returns one row per
    * (user_id, session_idx) with event count, start (epoch µs),
    * duration (µs) and 2-dp value sum. Ties in `ts` order by
    * `event_id` so the running session counter is reproducible.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(order))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_s").over(running))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        (max("ts_us") - min("ts_us")).as("duration_us"),
        round(sum("value"), 2).as("sum_value"))
  }

  /** Ordered three-step funnel: per user, the first `steps(0)` event,
    * the first `steps(1)` STRICTLY after it, and the first `steps(2)`
    * strictly after that. Returns one row per user who started the
    * funnel: (user_id, t1_us, t2_us?, t3_us?, reached 1..3).
    */
  def funnel(events: DataFrame, steps: (String, String, String)): DataFrame = {
    val e = events
      .filter(col("event_type").isin(steps._1, steps._2, steps._3))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val t1 = e.filter(col("event_type") === steps._1)
      .groupBy("user_id").agg(min("ts_us").as("t1_us"))
    val t2 = e.filter(col("event_type") === steps._2)
      .join(t1, "user_id")
      .filter(col("ts_us") > col("t1_us"))
      .groupBy("user_id").agg(min("ts_us").as("t2_us"))
    val t3 = e.filter(col("event_type") === steps._3)
      .join(t2, "user_id")
      .filter(col("ts_us") > col("t2_us"))
      .groupBy("user_id").agg(min("ts_us").as("t3_us"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(
        col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        (lit(1) + when(col("t2_us").isNotNull, 1).otherwise(0)
          + when(col("t3_us").isNotNull, 1).otherwise(0)).cast("int").as("reached"))
  }

  /** Tumbling event-time windows in batch via Spark's native
    * `window()` grouping — the same operator the streaming layer
    * aggregates under watermarks (S7), run over history: per
    * (day, event_type) volumes and value totals (a 2-dp money sum —
    * a mean would sit on 4th-decimal rounding boundaries across
    * engines). ONE partial-agg shuffle on (window, type); window start
    * crosses the oracle as epoch µs. 100-TB note: grouping keys are
    * day×type — the output is calendar-sized, the shuffle carries only
    * partial aggregates.
    */
  def dailyRates(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("day_start_us"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** RFM scoring: per-user recency (latest active epoch day),
    * frequency (event count) and monetary (2-dp purchase sum), each
    * bucketed 1–5 against EXACT interpolated quintile thresholds of
    * the user population (`percentile` == DuckDB `quantile_cont`, the
    * rl3 parity convention), composed as `rfm = r·100 + f·10 + m`.
    * Higher bucket = more recent / more active / higher spend.
    *
    * Scale shape: one user-keyed rollup, ONE single-row threshold
    * aggregate broadcast back, then a narrow bucket pass — no global
    * sort, no ntile over an unpartitioned window (the q12b trap).
    * Exact `percentile` buffers the user-level frame per aggregate —
    * the group-buffered audit form; swap `percentile_approx` in for a
    * mergeable sketch at web-scale user counts (rl3's exact/approx
    * convention).
    */
  def rfmScores(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("d"),
        col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(
        max("d").as("recency_d"),
        count(lit(1)).as("frequency"),
        round(sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0)), 2).as("monetary"))
    val th = perUser.agg(
      expr("percentile(recency_d, array(0.2D, 0.4D, 0.6D, 0.8D))").as("tr"),
      expr("percentile(frequency, array(0.2D, 0.4D, 0.6D, 0.8D))").as("tf"),
      expr("percentile(monetary, array(0.2D, 0.4D, 0.6D, 0.8D))").as("tm"))
    def bucket(v: Column, t: String): Column =
      (1 to 4).map(i => when(v > element_at(col(t), i), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
    perUser.crossJoin(broadcast(th))
      .select(col("user_id"), col("recency_d"), col("frequency"), col("monetary"),
        bucket(col("recency_d"), "tr").cast("int").as("r"),
        bucket(col("frequency"), "tf").cast("int").as("f"),
        bucket(col("monetary"), "tm").cast("int").as("m"))
      .withColumn("rfm",
        (col("r") * 100 + col("f") * 10 + col("m")).cast("int"))
  }

  /** Error-rate anomaly screen: per-user error share z-scored against
    * the population (stats ROUNDED before the z so engine mirrors
    * agree), flag at |z| ≥ `zThreshold`. The ops-facing cousin of the
    * curation outlier screens. Same scale shape as [[rfmScores]]: one
    * user rollup, single broadcast stats row, narrow decision — no
    * global sort.
    */
  def errorAnomalies(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val pu = events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_errors"))
      .withColumn("err_rate",
        round(col("n_errors").cast("double") / col("n_events"), 4))
    val st = pu.agg(round(avg("err_rate"), 4).as("mu"),
      round(stddev_samp(col("err_rate")), 4).as("sd"))
    pu.crossJoin(broadcast(st))
      // + 0.0 folds IEEE negative zero to +0.0 (DuckDB keeps -0.0 and
      // the hasher prints them differently)
      .withColumn("z",
        round((col("err_rate") - col("mu")) / col("sd"), 2) + lit(0.0))
      .withColumn("flagged", abs(col("z")) >= zThreshold)
      .select(col("user_id"), col("n_events"), col("n_errors"),
        col("err_rate"), col("z"), col("flagged"))
  }

  /** Weekly cohort retention: cohort = the user's first active epoch
    * WEEK (integer `epoch_day div 7` — pure arithmetic, no calendar
    * semantics to disagree on), offset = whole weeks since it.
    * Returns (cohort_week, week_offset, n_users, n_events).
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    events
      .select(col("user_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("d"))
      .withColumn("d0", min("d").over(byUser))
      .select(col("user_id"),
        expr("d0 div 7").as("cohort_week"),
        expr("(d - d0) div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
  }

  /** User-journey Markov transition matrix: P(next event type | current)
    * over each user's time-ordered stream — the first-order behavioral
    * model product analytics fits before anything fancier (and the
    * denominator for "surprising journey" anomaly scores). Probabilities
    * are integer MICRO-shares (`n·1e6 div total_from`) so the matrix is
    * exact across engines — the gr1/gr2 integral-share rule.
    *
    * Scale shape: one user-keyed window (the sessionize key — per-user
    * streams are bounded), one (from,to)-keyed partial-agg count down to
    * an event-type²-sized frame, and a window over THAT tiny frame for
    * the row totals. Nothing driver-side.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val pairs = e.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy("from_type")
    pairs.withColumn("total_from", sum(col("n")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n").cast("long").as("n"),
        col("total_from").cast("long").as("total_from"),
        expr("(n * 1000000) div total_from").as("p_micro"))
  }

  /** Multi-touch conversion attribution over a lookback window — the
    * marketing-analytics staple: every `conversionType` event is
    * attributed to the SAME user's `touchTypes` events in
    * `[ts_p − lookback, ts_p)`. Two models per channel in one pass:
    * last-touch (full credit to the latest in-window touch, ties by
    * event_id) and linear (each touch gets `1e6 div n` integer
    * micro-credits of the conversion). Conversions with no in-window
    * touch roll up under channel `(none)` — the row is ALWAYS present
    * (count 0 when none) so the output schema is corpus-independent.
    *
    * Scale shape (100 TB events): both sides are pushed-filter scans;
    * the pair frame is ONE user-keyed equi-join with the time window as
    * a join residual (per-user activity is human-bounded, so per-key
    * fan-out is bounded). Everything folds forward from there with NO
    * joins back: a (user, conversion, channel) aggregate (touch count +
    * channel-local last-touch max-struct — no per-conversion window
    * sort), then a (user, conversion) rollup whose channel detail rides
    * in a channels-bounded collect_list, then ONE explode + channel agg
    * that emits last-touch counts, pair counts and linear credits
    * together. The `(none)` bucket is arithmetic — total conversions
    * minus attributed ones via two singleton counts (the second re-runs
    * the pair chain pruned to its grouping keys) — not an anti-join.
    * Final frames are channel-sized. Integer µs time math and integer
    * micro credits end to end (the ev7/gr1 integral rule).
    */
  /** Automation/bot screen by inter-event regularity — humans arrive
    * bursty (gap coefficient-of-variation ≈ 1 for memoryless traffic,
    * higher for sessions), schedulers arrive metronomic (CV → 0): flag
    * users whose gap CV sits below `cvThreshMicro` with at least
    * `minGaps` observations. The abuse-filtering pass a training-data
    * pipeline runs before ingesting user-generated events.
    *
    * Cross-engine exactness: gaps are integer µs; CV derives from THREE
    * integer sums per user (count, Σgap as long, Σgap² in decimal(38,0)
    * ↔ HUGEINT — a month-scale gap squared overflows a long) through
    * one identically-structured double expression, then rounds to
    * micro. Sparse users (fewer than 2 gaps) carry the −1 sentinel.
    *
    * Scale shape: ONE user-keyed exchange shared by the lag window and
    * the per-user rollup (the ev1 rule); output is user-sized.
    */
  def regularityScreen(
      events: DataFrame,
      minGaps: Int = 5,
      cvThreshMicro: Long = 850000L): DataFrame = {
    require(minGaps >= 2 && cvThreshMicro > 0,
      s"invalid regularity params ($minGaps, $cvThreshMicro)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val gaps = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val agg = gaps.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        sum("gap").cast("long").as("sum_gap_us"),
        sum(col("gap").cast("decimal(20,0)") * col("gap")).as("sg2"))
    val cvExpr =
      sqrt(greatest(
        (col("sg2").cast("double") - col("sum_gap_us").cast("double")
          * col("sum_gap_us") / col("n_gaps")) / (col("n_gaps") - 1),
        lit(0.0))) / (col("sum_gap_us").cast("double") / col("n_gaps"))
    agg.select(col("user_id"), col("n_gaps"), col("sum_gap_us"),
        when(col("n_gaps") >= 2 && col("sum_gap_us") > 0,
          floor(cvExpr * lit(1000000.0) + lit(0.5)).cast("long"))
          .otherwise(lit(-1L)).as("cv_micro"))
      .withColumn("is_bot",
        when(col("n_gaps") >= minGaps && col("cv_micro") >= 0 &&
          col("cv_micro") < cvThreshMicro, lit(1)).otherwise(lit(0)))
  }

  def attribution(
      events: DataFrame,
      lookbackDays: Int = 7,
      touchTypes: Seq[String] = Seq("view", "click"),
      conversionType: String = "purchase"): DataFrame = {
    require(lookbackDays > 0, s"invalid lookbackDays=$lookbackDays")
    val lookUs = lookbackDays * 86400L * 1000000L
    val conv = events.filter(col("event_type") === conversionType)
      .select(col("user_id"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id"), col("event_id").as("t_id"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("t_us"))
    val pairs = conv.join(touch, Seq("user_id"))
      .filter(col("t_us") < col("p_us") &&
        col("t_us") >= col("p_us") - lit(lookUs))
    // the ONLY pass over the pair frame: per-(conversion, channel) touch
    // count + channel-local last touch ((t_us, t_id) max — event ids are
    // unique, so the struct max is total and pre-folding per channel
    // keeps the global winner)
    val pc = pairs.groupBy("user_id", "p_id", "channel")
      .agg(count(lit(1)).cast("long").as("c"),
        max(struct(col("t_us"), col("t_id"))).as("lastc"))
    val per = pc.groupBy("user_id", "p_id")
      .agg(sum("c").cast("long").as("n"),
        max(struct(col("lastc.t_us").as("t_us"), col("lastc.t_id").as("t_id"),
          col("channel"))).as("last"),
        collect_list(struct(col("channel"), col("c"))).as("chans"))
    // ONE channel-keyed agg carries all three outputs: each conversion
    // contributes exactly one last-touch credit (to its winner channel)
    // and `c * (1e6 div n)` linear micro-credits per touched channel
    val attributed = per
      .select(col("last").getField("channel").as("last_channel"), col("n"),
        explode(col("chans")).as("ch"))
      .groupBy(col("ch.channel").as("channel"))
      .agg(sum(when(col("last_channel") === col("ch.channel"), 1L)
          .otherwise(0L)).cast("long").as("n_last"),
        sum(col("ch.c")).cast("long").as("n_pairs"),
        sum(expr("ch.c * (1000000 div n)")).cast("long").as("linear_micro"))
    // (none) = conversions minus attributed ones — two singleton counts,
    // no anti-join; the per-count branch re-runs the pair chain pruned
    // to its grouping keys only
    val none = conv.agg(count(lit(1)).cast("long").as("tot"))
      .crossJoin(per.agg(count(lit(1)).cast("long").as("wt")))
      .select(lit("(none)").as("channel"),
        (col("tot") - col("wt")).cast("long").as("n_last"),
        lit(0L).as("n_pairs"), lit(0L).as("linear_micro"))
    attributed.unionByName(none)
  }

  /** Discrete-time survival/churn lifetable (the Kaplan–Meier
    * estimator's grouped form): per activity-lifetime period, how many
    * users were still at risk, how many CHURNED there (lifetime ended
    * with observable time left) and how many were CENSORED (still
    * active at the corpus end — their true lifetime is unknown, and
    * counting them as churn is the classic retention-analysis bias
    * this operator exists to avoid). `hazard_bp` = churned·10⁴ ÷
    * at_risk in integer basis points — exact across engines, no float
    * ratio.
    *
    * Period semantics: lifetime = (last − first) ÷ `periodMicros` in
    * integer division over epoch µs (the family's integer-time rule);
    * a user churns in their last active period iff at least one full
    * unobserved period remained before the corpus end. Only periods
    * where some lifetime ENDS emit a row (at_risk is a suffix sum over
    * those rows — periods nobody ends in contribute nothing).
    *
    * Scale shape: ONE user-keyed agg (first/last), a singleton
    * corpus-end agg broadcast into it, then a period-keyed rollup —
    * after which the frame is TIMELINE-bounded (#periods rows), so the
    * at-risk suffix sum is computed as the tiny triangular self-join
    * (the q12b offsets pattern: ≤ P² pairs of a constant-sized P),
    * never an unpartitioned window.
    */
  def survivalCurve(
      events: DataFrame,
      periodMicros: Long = 86400000000L): DataFrame = {
    require(periodMicros > 0, s"invalid periodMicros=$periodMicros")
    val ev = events.select(col("user_id").cast("long").as("user_id"),
      unix_micros(col("ts")).as("tus"))
    val tend = ev.agg(max("tus").as("tend"))
    val u = ev.groupBy("user_id")
      .agg(min("tus").as("fst"), max("tus").as("lst"))
      .crossJoin(broadcast(tend))
      .select(
        expr(s"(lst - fst) div $periodMicros").as("life_p"),
        expr(s"(tend - fst) div $periodMicros").as("obs_p"))
    val ends = u.groupBy(col("life_p").cast("int").as("period"))
      .agg(count(lit(1)).cast("long").as("ends"),
        sum(when(col("obs_p") > col("life_p"), 1L).otherwise(0L))
          .cast("long").as("churned"))
    ends.as("a")
      .join(ends.as("b"), col("b.period") >= col("a.period"))
      .groupBy(col("a.period").as("period"), col("a.ends").as("ends"),
        col("a.churned").as("churned"))
      .agg(sum(col("b.ends")).cast("long").as("at_risk"))
      .select(col("period"), col("at_risk"), col("churned"),
        (col("ends") - col("churned")).cast("long").as("censored"),
        expr("(churned * 10000) div at_risk").cast("long").as("hazard_bp"))
  }
}
