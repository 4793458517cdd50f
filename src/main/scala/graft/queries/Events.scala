package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, GraphRank}
import graft.sources.Tables
import graft.queries.QueryDef.BoundedSortOps

/** Event-analytics and graph-centrality queries (SURVEY.md §2.b
  * extension rows): the batch twins of the reference's per-key stateful
  * event processing — sessionization, ordered funnels, cohort
  * retention — plus link-graph PageRank for domain-authority curation.
  *
  * Timestamp parity rule: all time math crosses the oracle as integer
  * epoch MICROSECONDS (`unix_micros` ↔ DuckDB `epoch_us`) or integer
  * epoch days — never float seconds — under the UTC session the
  * harness pins, so every hash is exact.
  */
object Events {

  /** 30-minute-gap sessionization over the full event stream. */
  val ev1_sessionize = QueryDef.sqlChecked(
    "ev1_sessionize",
    """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
      |f AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
      |g AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_s FROM f),
      |h AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM g)
      |SELECT user_id, session_idx, count(*) AS n_events,
      | CAST(min(ts_us) AS BIGINT) AS start_us,
      | CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
      | round(sum(value), 2) AS sum_value
      |FROM h GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
    EventAnalytics.sessionize(Tables.events(s, d), gapMinutes = 30)
      .orderBy("user_id", "session_idx")
  }

  /** view → click → purchase ordered funnel, strict-after semantics.
    * NULL step times surface as -1 (the hasher's no-NULL convention).
    */
  val ev2_funnel = QueryDef.sqlChecked(
    "ev2_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      |           WHERE event_type IN ('view', 'click', 'purchase')),
      |t1 AS (SELECT user_id, CAST(min(ts_us) AS BIGINT) AS t1_us
      |       FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t2_us
      |       FROM e JOIN t1 USING (user_id)
      |       WHERE event_type = 'click' AND ts_us > t1_us GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, CAST(min(ts_us) AS BIGINT) AS t3_us
      |       FROM e JOIN t2 USING (user_id)
      |       WHERE event_type = 'purchase' AND ts_us > t2_us GROUP BY e.user_id)
      |SELECT t1.user_id, t1_us,
      | coalesce(t2_us, CAST(-1 AS BIGINT)) AS t2_us,
      | coalesce(t3_us, CAST(-1 AS BIGINT)) AS t3_us,
      | CAST(1 + CASE WHEN t2_us IS NOT NULL THEN 1 ELSE 0 END
      |        + CASE WHEN t3_us IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS reached
      |FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
      |        LEFT JOIN t3 ON t1.user_id = t3.user_id
      |ORDER BY t1.user_id""".stripMargin) { (s, d) =>
    EventAnalytics.funnel(Tables.events(s, d), ("view", "click", "purchase"))
      .select(col("user_id"), col("t1_us"),
        coalesce(col("t2_us"), lit(-1L)).as("t2_us"),
        coalesce(col("t3_us"), lit(-1L)).as("t3_us"),
        col("reached"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention grid (integer epoch-week arithmetic). */
  val ev3_retention = QueryDef.sqlChecked(
    "ev3_retention",
    """WITH e AS (SELECT user_id,
      |        date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d FROM events),
      |f AS (SELECT user_id, d, min(d) OVER (PARTITION BY user_id) AS d0 FROM e),
      |g AS (SELECT user_id, d0 // 7 AS cohort_week, (d - d0) // 7 AS week_offset FROM f)
      |SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
      | CAST(week_offset AS BIGINT) AS week_offset,
      | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      | count(*) AS n_events
      |FROM g GROUP BY cohort_week, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    EventAnalytics.retentionCohorts(Tables.events(s, d))
      .orderSmall("cohort_week", "week_offset")
  }

  /** Native tumbling-window grouping in batch (the streaming S7
    * operator over history). DuckDB mirrors the UTC day floor.
    */
  val ev4_daily_rates = QueryDef.sqlChecked(
    "ev4_daily_rates",
    """SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS day_start_us,
      | event_type, count(*) AS n_events,
      | round(sum(value), 2) AS sum_value
      |FROM events GROUP BY day_start_us, event_type
      |ORDER BY day_start_us, event_type""".stripMargin) { (s, d) =>
    EventAnalytics.dailyRates(Tables.events(s, d))
      .orderSmall("day_start_us", "event_type")
  }

  /** RFM quintile scoring against exact interpolated thresholds. */
  val ev5_rfm = QueryDef.sqlChecked(
    "ev5_rfm",
    """WITH pu AS (SELECT user_id,
      |        CAST(max(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS BIGINT) AS recency_d,
      |        count(*) AS frequency,
      |        round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS monetary
      |      FROM events GROUP BY user_id),
      |th AS (SELECT quantile_cont(recency_d, [0.2, 0.4, 0.6, 0.8]) AS tr,
      |        quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS tf,
      |        quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS tm
      |       FROM pu),
      |b AS (SELECT user_id, recency_d, frequency, monetary,
      |       CAST(1 + (CASE WHEN recency_d > tr[1] THEN 1 ELSE 0 END)
      |              + (CASE WHEN recency_d > tr[2] THEN 1 ELSE 0 END)
      |              + (CASE WHEN recency_d > tr[3] THEN 1 ELSE 0 END)
      |              + (CASE WHEN recency_d > tr[4] THEN 1 ELSE 0 END) AS INTEGER) AS r,
      |       CAST(1 + (CASE WHEN frequency > tf[1] THEN 1 ELSE 0 END)
      |              + (CASE WHEN frequency > tf[2] THEN 1 ELSE 0 END)
      |              + (CASE WHEN frequency > tf[3] THEN 1 ELSE 0 END)
      |              + (CASE WHEN frequency > tf[4] THEN 1 ELSE 0 END) AS INTEGER) AS f,
      |       CAST(1 + (CASE WHEN monetary > tm[1] THEN 1 ELSE 0 END)
      |              + (CASE WHEN monetary > tm[2] THEN 1 ELSE 0 END)
      |              + (CASE WHEN monetary > tm[3] THEN 1 ELSE 0 END)
      |              + (CASE WHEN monetary > tm[4] THEN 1 ELSE 0 END) AS INTEGER) AS m
      |      FROM pu CROSS JOIN th)
      |SELECT user_id, recency_d, frequency, monetary, r, f, m,
      | CAST(r * 100 + f * 10 + m AS INTEGER) AS rfm
      |FROM b ORDER BY user_id""".stripMargin) { (s, d) =>
    EventAnalytics.rfmScores(Tables.events(s, d)).orderBy("user_id")
  }

  /** Per-user error-rate z-score screen; stats rounded before the z. */
  val ev6_error_anomaly = QueryDef.sqlChecked(
    "ev6_error_anomaly",
    """WITH pu AS (SELECT user_id, count(*) AS n_events,
      |        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
      |       FROM events GROUP BY user_id),
      |p2 AS (SELECT *, round(CAST(n_errors AS DOUBLE)/n_events, 4) AS err_rate FROM pu),
      |st AS (SELECT round(avg(err_rate), 4) AS mu,
      |        round(stddev_samp(err_rate), 4) AS sd FROM p2)
      |SELECT user_id, n_events, n_errors, err_rate,
      | round((err_rate - mu)/sd, 2) + 0.0 AS z,
      | abs(round((err_rate - mu)/sd, 2)) >= 2.0 AS flagged
      |FROM p2 CROSS JOIN st ORDER BY user_id""".stripMargin) { (s, d) =>
    EventAnalytics.errorAnomalies(Tables.events(s, d)).orderBy("user_id")
  }

  private val Gr1Iters = 5

  /** The shared PageRank CTE chain (edge fixture + 5 unrolled
    * fixed-point iterations — the cl1_kmeans convention); integer
    * arithmetic makes the match exact, not approximate. Reused by
    * gr1 (ranks out) and gr2 (ranks feeding the sampler).
    */
  private val Gr1Ctes: String = {
    val rounds = (1 to Gr1Iters).map { i =>
      s"""c$i AS (SELECT e.dst, CAST(sum((r.rank * e.w) // o.out_w) AS BIGINT) AS sc
         |       FROM e JOIN r${i - 1} r ON e.src = r.node JOIN o ON e.src = o.src
         |       GROUP BY e.dst),
         |r$i AS (SELECT node, (150000000 // n) + (85 * coalesce(sc, 0)) // 100 AS rank
         |       FROM nodes CROSS JOIN nn LEFT JOIN c$i ON node = dst)""".stripMargin
    }.mkString(",\n")
    s"""ed AS (
       |  SELECT source AS src, 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst FROM documents
       |  UNION ALL
       |  SELECT source AS src, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR) AS dst FROM documents),
       |e AS (SELECT src, dst, count(*) AS w FROM ed GROUP BY src, dst),
       |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000 // n AS rank FROM nodes CROSS JOIN nn),
       |$rounds""".stripMargin
  }

  private val Gr1Sql: String =
    s"""WITH $Gr1Ctes
       |SELECT node, CAST(rank AS BIGINT) AS rank_units
       |FROM r$Gr1Iters ORDER BY node""".stripMargin

  /** Domain-authority PageRank over the doc-derived link graph —
    * 5 fixed-point iterations ([[GraphRank.pageRankFixedPoint]]). */
  val gr1_pagerank = QueryDef.sqlChecked("gr1_pagerank", Gr1Sql) { (s, d) =>
    val edges = GraphRank.documentLinkEdges(Tables.documents(s, d))
    GraphRank.pageRankFixedPoint(edges, Gr1Iters)
      .select(col("node"), col("rank").as("rank_units"))
      .orderSmall("node")
  }

  /** Authority-weighted sampling: ranks → integer keep thresholds →
    * the mix32 decision rule (the same positive-modulo chain as the
    * sp1/dc1 mirrors). Fully integral, so PageRank iterations AND the
    * sampling verdicts mirror exactly.
    */
  private val Gr2Sql: String =
    s"""WITH $Gr1Ctes,
       |tot AS (SELECT CAST(sum(rank) AS BIGINT) AS total FROM r$Gr1Iters),
       |thr AS (SELECT node, (rank * 1000000) // total AS thr
       |        FROM r$Gr1Iters CROSS JOIN tot),
       |mx AS (SELECT doc_id, source, xor(m2, m2 >> 13) AS hs FROM (
       |  SELECT doc_id, source, (xor(h0, h0 >> 16) * 40503) % 4294967296 AS m2 FROM (
       |    SELECT doc_id, source, ((doc_id % 4294967296) + 4294967296) % 4294967296 AS h0
       |    FROM documents)))
       |SELECT CAST(m.doc_id AS BIGINT) AS doc_id, m.source,
       | CAST(t.thr AS BIGINT) AS thr
       |FROM mx m JOIN thr t ON m.source = t.node
       |WHERE m.hs % 1000000 < t.thr
       |ORDER BY doc_id""".stripMargin

  /** PageRank authority share → per-source keep threshold → mix32
    * per-doc decision ([[GraphRank.authoritySample]]).
    *
    * Final sort stays the global `orderBy`: the output is a SAMPLE OF
    * DOCUMENTS (≈ |D|/#sources rows — corpus-proportional), and the
    * sampling decision is a narrow filter over the documents scan, so
    * an `orderSmall` here puts Coalesce(1) directly over the scan and
    * serializes the whole corpus pass into one task (the r19 verdict's
    * scale regression; PlanSpec's coalesce-over-scan sweep pins it).
    */
  val gr2_authority_sample = QueryDef.sqlChecked("gr2_authority_sample", Gr2Sql) {
    (s, d) =>
      GraphRank.authoritySample(Tables.documents(s, d), Gr1Iters)
        .orderBy("doc_id")
  }

  /** First-order user-journey Markov matrix
    * ([[EventAnalytics.transitionMatrix]]): per-user lead over the
    * time-ordered stream, (from,to) counts, integer micro-share
    * probabilities — exact like the gr-family shares.
    */
  val ev7_transitions = QueryDef.sqlChecked(
    "ev7_transitions",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events),
      |f AS (SELECT user_id, event_type,
      |        lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_type
      |      FROM e),
      |p AS (SELECT event_type AS from_type, next_type AS to_type,
      |        CAST(count(*) AS BIGINT) AS n
      |      FROM f WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS total_from
      |      FROM p)
      |SELECT from_type, to_type, n, total_from,
      | CAST((n * 1000000) // total_from AS BIGINT) AS p_micro
      |FROM t ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    EventAnalytics.transitionMatrix(Tables.events(s, d))
      .orderSmall("from_type", "to_type")
  }

  /** ev8: multi-touch conversion attribution
    * ([[EventAnalytics.attribution]]) — last-touch AND linear credit
    * per channel over a 7-day lookback, integer micro credits
    * (`1e6 div n` per touch). The mirror replays the user-keyed
    * window join, the per-conversion touch count, the (t_us, t_id)-max
    * last touch (a row_number window in SQL, the same winner as the
    * engine's max-struct fold), and the integral linear rollup; the
    * `(none)` row is unconditional so the schema is corpus-independent.
    */
  val ev8_attribution = QueryDef.sqlChecked(
    "ev8_attribution",
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |conv AS (SELECT user_id, event_id AS p_id, ts_us AS p_us FROM e WHERE event_type = 'purchase'),
      |touch AS (SELECT user_id, event_id AS t_id, event_type AS channel, ts_us AS t_us
      |          FROM e WHERE event_type IN ('view', 'click')),
      |pairs AS MATERIALIZED (SELECT c.user_id, c.p_id, t.t_id, t.channel, t.t_us
      |  FROM conv c JOIN touch t ON t.user_id = c.user_id
      |  AND t.t_us < c.p_us AND t.t_us >= c.p_us - 604800000000),
      |per AS MATERIALIZED (SELECT user_id, p_id, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs GROUP BY user_id, p_id),
      |lastt AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_last FROM (
      |  SELECT user_id, p_id, channel,
      |    row_number() OVER (PARTITION BY user_id, p_id ORDER BY t_us DESC, t_id DESC) AS rn
      |  FROM pairs) WHERE rn = 1 GROUP BY channel),
      |pc AS (SELECT user_id, p_id, channel, CAST(count(*) AS BIGINT) AS c
      |  FROM pairs GROUP BY user_id, p_id, channel),
      |lin AS (SELECT channel, CAST(sum(c) AS BIGINT) AS n_pairs,
      |  CAST(sum(c * (1000000 // n)) AS BIGINT) AS linear_micro
      |  FROM pc JOIN per USING (user_id, p_id) GROUP BY channel),
      |attributed AS (SELECT l.channel, coalesce(la.n_last, CAST(0 AS BIGINT)) AS n_last,
      |  l.n_pairs, l.linear_micro
      |  FROM lin l LEFT JOIN lastt la USING (channel)),
      |non AS (SELECT '(none)' AS channel, CAST(count(*) AS BIGINT) AS n_last,
      |  CAST(0 AS BIGINT) AS n_pairs, CAST(0 AS BIGINT) AS linear_micro
      |  FROM conv c WHERE NOT EXISTS (
      |    SELECT 1 FROM per p WHERE p.user_id = c.user_id AND p.p_id = c.p_id))
      |SELECT * FROM (SELECT * FROM attributed UNION ALL SELECT * FROM non)
      |ORDER BY channel""".stripMargin) { (s, d) =>
    EventAnalytics.attribution(Tables.events(s, d))
      .orderSmall("channel")
  }

  /** ev9: inter-event regularity bot screen
    * ([[EventAnalytics.regularityScreen]]) — per-user gap CV in integer
    * micro, flag below 0.85 with ≥5 gaps. The mirror replays the lag
    * window, the three integer sums (Σgap² through HUGEINT — the gr3
    * wide-integer rule) and the identically-structured CV expression.
    */
  val ev9_regularity = QueryDef.sqlChecked(
    "ev9_regularity",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
      |g AS (SELECT user_id,
      |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
      |      FROM e),
      |a AS (SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,
      |        CAST(sum(gap) AS BIGINT) AS sum_gap_us,
      |        sum(CAST(gap AS HUGEINT) * gap) AS sg2
      |      FROM g WHERE gap IS NOT NULL GROUP BY user_id),
      |c AS (SELECT user_id, n_gaps, sum_gap_us,
      |        CASE WHEN n_gaps >= 2 AND sum_gap_us > 0 THEN
      |          CAST(round(sqrt(greatest(
      |              (CAST(sg2 AS DOUBLE) - CAST(sum_gap_us AS DOUBLE) * sum_gap_us / n_gaps)
      |                / (n_gaps - 1), 0.0))
      |            / (CAST(sum_gap_us AS DOUBLE) / n_gaps) * 1000000) AS BIGINT)
      |        ELSE CAST(-1 AS BIGINT) END AS cv_micro
      |      FROM a)
      |SELECT user_id, n_gaps, sum_gap_us, cv_micro,
      |  CASE WHEN n_gaps >= 5 AND cv_micro >= 0 AND cv_micro < 850000
      |       THEN 1 ELSE 0 END AS is_bot
      |FROM c ORDER BY user_id""".stripMargin) { (s, d) =>
    EventAnalytics.regularityScreen(Tables.events(s, d)).orderBy("user_id")
  }

  /** ev10: discrete-time survival lifetable
    * ([[EventAnalytics.survivalCurve]], day periods) — per lifetime
    * day: at-risk users (suffix sum over end counts), churned vs
    * censored ends, and the integer basis-point hazard. All-integer
    * output; the windowed suffix sum CASTs to BIGINT on the DuckDB
    * side (windowed `sum()` is HUGEINT — the recorded pk1 dtype trap).
    */
  val ev10_survival = QueryDef.sqlChecked(
    "ev10_survival",
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
      |t AS (SELECT max(tus) AS tend FROM ev),
      |u AS (SELECT user_id, min(tus) AS fst, max(tus) AS lst FROM ev
      |      GROUP BY user_id),
      |lp AS (SELECT (lst - fst) // 86400000000 AS life_p,
      |        ((SELECT tend FROM t) - fst) // 86400000000 AS obs_p FROM u),
      |en AS (SELECT CAST(life_p AS INTEGER) AS period,
      |        CAST(count(*) AS BIGINT) AS ends,
      |        CAST(sum(CASE WHEN obs_p > life_p THEN 1 ELSE 0 END) AS BIGINT)
      |          AS churned
      |       FROM lp GROUP BY life_p),
      |ar AS (SELECT period, ends, churned,
      |        CAST(sum(ends) OVER (ORDER BY period DESC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |          AS at_risk
      |       FROM en)
      |SELECT period, at_risk, churned,
      |  CAST(ends - churned AS BIGINT) AS censored,
      |  (churned * 10000) // at_risk AS hazard_bp
      |FROM ar ORDER BY period""".stripMargin) { (s, d) =>
    EventAnalytics.survivalCurve(Tables.events(s, d)).orderSmall("period")
  }

  private val Gr3Iters = 3

  /** gr3 mirror: HITS unrolled — per round, the hub→authority sum, the
    * exact HUGEINT normalization `(raw·1e9) // total`, then the
    * authority→hub sum and its normalization (the engine does the
    * identical arithmetic in decimal(38,0) — both exact, so the
    * trajectory matches bit-for-bit like gr1's).
    */
  private val Gr3Sql: String = {
    val rounds = (1 to Gr3Iters).map { i =>
      s"""ar$i AS MATERIALIZED (SELECT e.dst AS node, sum(CAST(h.s AS HUGEINT) * e.w) AS raw
         |        FROM e JOIN h${i - 1} h ON e.src = h.node GROUP BY e.dst),
         |a$i AS MATERIALIZED (SELECT n.node,
         |         CAST(coalesce((ar.raw * 1000000000) // (SELECT sum(raw) FROM ar$i), 0) AS BIGINT) AS s
         |        FROM nodes n LEFT JOIN ar$i ar ON ar.node = n.node),
         |hr$i AS MATERIALIZED (SELECT e.src AS node, sum(CAST(a.s AS HUGEINT) * e.w) AS raw
         |        FROM e JOIN a$i a ON e.dst = a.node GROUP BY e.src),
         |h$i AS MATERIALIZED (SELECT n.node,
         |         CAST(coalesce((hr.raw * 1000000000) // (SELECT sum(raw) FROM hr$i), 0) AS BIGINT) AS s
         |        FROM nodes n LEFT JOIN hr$i hr ON hr.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (
       |  SELECT source AS src, 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst FROM documents
       |  UNION ALL
       |  SELECT source AS src, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR) AS dst FROM documents),
       |e AS (SELECT src, dst, count(*) AS w FROM ed GROUP BY src, dst),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
       |h0 AS (SELECT node, 1000000000 // n AS s FROM nodes CROSS JOIN nn),
       |$rounds
       |SELECT h.node, CAST(h.s AS BIGINT) AS hub, CAST(a.s AS BIGINT) AS authority
       |FROM h$Gr3Iters h JOIN a$Gr3Iters a ON a.node = h.node
       |ORDER BY h.node""".stripMargin
  }

  /** HITS hubs/authorities over the doc-derived link graph — the other
    * classic curation prior next to gr1's PageRank
    * ([[GraphRank.hitsFixedPoint]], exact integer trajectory).
    */
  val gr3_hits = QueryDef.sqlChecked("gr3_hits", Gr3Sql) { (s, d) =>
    GraphRank.hitsFixedPoint(
        GraphRank.documentLinkEdges(Tables.documents(s, d)), Gr3Iters)
      .orderSmall("node")
  }

  private val Gr4Rounds = 3

  /** gr4 mirror: synchronous weighted label propagation unrolled —
    * per round, the (node, neighbor-label) vote sum over the
    * symmetrized edge list, then the argmax with ties to the smallest
    * label (the mirror's rank window realizes the same total order as
    * the engine's `min(struct(-c, lbl))` fold). Community sizes off
    * the final round.
    */
  private val Gr4Sql: String = {
    val rounds = (1 to Gr4Rounds).map { i =>
      s"""v$i AS (SELECT ue.dst AS node, l.lbl, CAST(sum(ue.w) AS BIGINT) AS c
         |        FROM ue JOIN l${i - 1} l ON l.node = ue.src
         |        GROUP BY ue.dst, l.lbl),
         |l$i AS MATERIALIZED (SELECT n.node, coalesce(w.lbl, n.node) AS lbl
         |        FROM nodes n LEFT JOIN (
         |          SELECT node, lbl FROM (
         |            SELECT node, lbl,
         |              row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
         |            FROM v$i) WHERE rn = 1) w USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH ed AS (
       |  SELECT source AS src, 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst FROM documents
       |  UNION ALL
       |  SELECT source AS src, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR) AS dst FROM documents),
       |e AS (SELECT src, dst, count(*) AS w FROM ed GROUP BY src, dst),
       |ue AS MATERIALIZED (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
       |  SELECT src, dst, w FROM e UNION ALL SELECT dst, src, w FROM e)
       |  GROUP BY src, dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ue),
       |l0 AS (SELECT node, node AS lbl FROM nodes),
       |$rounds,
       |cs AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize
       |       FROM l$Gr4Rounds GROUP BY lbl)
       |SELECT l.node, l.lbl AS label, cs.csize
       |FROM l$Gr4Rounds l JOIN cs USING (lbl) ORDER BY l.node""".stripMargin
  }

  /** Link-graph communities via deterministic synchronous label
    * propagation ([[GraphRank.labelPropagation]]) — template-farm /
    * mirror-cluster detection over the same doc-derived link graph as
    * gr1/gr3.
    */
  val gr4_label_prop = QueryDef.sqlChecked("gr4_label_prop", Gr4Sql) { (s, d) =>
    GraphRank.labelPropagation(
        GraphRank.documentLinkEdges(Tables.documents(s, d)), Gr4Rounds)
      .orderSmall("node")
  }

  /** gr5 mirror: the degree-ordered-orientation triangle count
    * replayed relationally — symmetrize/distinct, canonical a<b edges,
    * degrees, the (deg, node) orientation CASE, apex wedges, the
    * closing-edge join, and the integer-division clustering
    * coefficient.
    */
  private val Gr5Sql: String =
    s"""WITH ed AS (
       |  SELECT source AS src, 'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS dst FROM documents
       |  UNION ALL
       |  SELECT source AS src, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR) AS dst FROM documents),
       |e AS (SELECT DISTINCT src, dst FROM ed WHERE src <> dst),
       |und AS MATERIALIZED (SELECT DISTINCT a, b FROM (
       |  SELECT src AS a, dst AS b FROM e UNION ALL SELECT dst, src FROM e)),
       |canon AS MATERIALIZED (SELECT a, b FROM und WHERE a < b),
       |deg AS MATERIALIZED (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM und GROUP BY 1),
       |orient AS MATERIALIZED (SELECT
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
       |         THEN c.a ELSE c.b END AS u,
       |    CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
       |         THEN c.b ELSE c.a END AS v
       |  FROM canon c JOIN deg da ON da.node = c.a JOIN deg db ON db.node = c.b),
       |tri AS (SELECT w.u, w.x, w.y FROM (
       |    SELECT o1.u, o1.v AS x, o2.v AS y
       |    FROM orient o1 JOIN orient o2 ON o1.u = o2.u AND o1.v < o2.v) w
       |  JOIN canon c ON c.a = least(w.x, w.y) AND c.b = greatest(w.x, w.y)),
       |tn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
       |  SELECT u AS node FROM tri
       |  UNION ALL SELECT x FROM tri
       |  UNION ALL SELECT y FROM tri) GROUP BY 1)
       |SELECT d.node, d.deg AS degree,
       | CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       | CAST(CASE WHEN d.deg >= 2
       |      THEN (2 * coalesce(t.triangles, 0) * 1000000) // (d.deg * (d.deg - 1))
       |      ELSE 0 END AS BIGINT) AS lcc_micro
       |FROM deg d LEFT JOIN tn t USING (node) ORDER BY d.node""".stripMargin

  /** Link-graph triangle counts + local clustering coefficient
    * ([[GraphRank.triangleStats]]) — the structural-quality signal
    * over the same doc-derived link graph as gr1/gr3/gr4.
    */
  val gr5_triangles = QueryDef.sqlChecked("gr5_triangles", Gr5Sql) { (s, d) =>
    GraphRank.triangleStats(
        GraphRank.documentLinkEdges(Tables.documents(s, d)))
      .orderSmall("node")
  }

  val all: Seq[QueryDef] =
    Seq(ev1_sessionize, ev2_funnel, ev3_retention, ev4_daily_rates, ev5_rfm,
      ev6_error_anomaly, ev7_transitions, ev8_attribution, ev9_regularity,
      ev10_survival, gr1_pagerank, gr2_authority_sample, gr3_hits,
      gr4_label_prop, gr5_triangles)
}
