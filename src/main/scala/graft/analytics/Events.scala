package graft.analytics

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Product-analytics surface over the raw `events` stream table — the
  * cohort/funnel reports a usage-analytics consumer of the reference's
  * change feed runs downstream of the audit machinery (the reference
  * exposes the feed; these are the canonical queries run against it).
  * Unlike the graft.audit ops, these read `events` as behavioral data
  * (user_id × event_type × ts), not as an I/U/D change log.
  *
  * Scale posture shared by both ops: every stage keys on user_id, so all
  * shuffles land on one exchange family (AQE aligns/reuses them); no
  * window ever partitions by a low-cardinality key over the raw feed —
  * aggregates collapse to |users| (then |days| / |stages|) rows first.
  */
object EventAnalytics {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)

  /** Cohort retention matrix on purchase activity: users cohorted by
    * first-purchase day; a cohort-day × day-offset cell counts the
    * distinct users of that cohort purchasing again at that offset.
    * Purchase (not any-event) activity keeps the matrix discriminative on
    * a dense feed — and is the semantics a revenue-retention report wants.
    *
    * Scale shape: the feed collapses to (user, day) pairs, the cohort
    * assignment is a user-keyed aggregate joined back user-to-user (same
    * exchange family), and the matrix itself is ≤ |days|² cells; the
    * per-cohort size join is a broadcast of ≤ |days| rows. */
  val eventRetention: Q = Q.sql(
    "event_retention",
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day
      |  FROM events WHERE event_type = 'purchase'),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
      |c AS (SELECT cohort_day, count(*) AS cohort_users FROM f GROUP BY 1),
      |a AS (
      |  SELECT DISTINCT f.cohort_day,
      |    CAST(date_diff('day', f.cohort_day, ev.day) AS INT) AS day_offset,
      |    ev.user_id
      |  FROM ev JOIN f ON ev.user_id = f.user_id),
      |r AS (SELECT cohort_day, day_offset, count(*) AS active_users
      |      FROM a GROUP BY 1, 2)
      |SELECT r.cohort_day, r.day_offset, c.cohort_users, r.active_users,
      |  round(CAST(active_users AS DOUBLE) / cohort_users, 4) AS retention
      |FROM r JOIN c ON r.cohort_day = c.cohort_day
      |ORDER BY r.cohort_day, r.day_offset""".stripMargin) { (s, d) =>
    // no early per-(user, day) distinct: min(day) needs none, and the
    // (cohort, offset, user) distinct below dedups the cells anyway — a
    // pre-distinct would cost one extra full-feed exchange for nothing
    val days = ev(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cohorts = first.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_users"))
    days.join(first, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("int").as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .join(broadcast(cohorts), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("cohort_users"),
        col("active_users"),
        round(col("active_users").cast("double") / col("cohort_users"), 4)
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** First-touch conversion funnel signup → view → click → purchase, each
    * step bounded to 24 h after the previous step's first touch. The
    * sequential dependency (step k's window opens at step k-1's first
    * qualifying ts) is what plain conditional aggregation cannot express;
    * each stage is a user-keyed min-aggregate semi-joined forward, so the
    * whole chain rides one user_id exchange family and the stage frontier
    * only ever SHRINKS (150 → 39 → 16 → 5 at sf0.01). The final report is
    * four single-row aggregates unioned, with conversion ratios from a
    * window over those 4 rows. */
  /** The 24h-windowed ordered funnel stages (s1..s4) — single oracle-side
    * definition shared by event_funnel and event_stage_latency. */
  private val funnelStageCtesSql: String =
    """s1 AS (SELECT user_id, min(ts) AS t FROM events
      |            WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s1 ON e.user_id = s1.user_id
      |       WHERE e.event_type = 'view' AND e.ts > s1.t
      |         AND e.ts <= s1.t + INTERVAL 24 HOUR GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s2 ON e.user_id = s2.user_id
      |       WHERE e.event_type = 'click' AND e.ts > s2.t
      |         AND e.ts <= s2.t + INTERVAL 24 HOUR GROUP BY 1),
      |s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN s3 ON e.user_id = s3.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > s3.t
      |         AND e.ts <= s3.t + INTERVAL 24 HOUR GROUP BY 1)""".stripMargin

  /** Spark twin of [[funnelStageCtesSql]]: the per-stage first-conversion
    * frames, in funnel order. */
  private def funnelStages(s: SparkSession, d: String): Seq[(String, DataFrame)] = {
    val e = ev(s, d).select("user_id", "event_type", "ts")
    val win = expr("INTERVAL 24 HOURS")
    def stage(prev: DataFrame, etype: String): DataFrame =
      e.filter(col("event_type") === etype)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .filter(col("ts") > col("t_prev") && col("ts") <= col("t_prev") + win)
        .groupBy("user_id").agg(min("ts").as("t"))
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("t"))
    val s2 = stage(s1, "view")
    val s3 = stage(s2, "click")
    val s4 = stage(s3, "purchase")
    Seq("signup" -> s1, "view" -> s2, "click" -> s3, "purchase" -> s4)
  }

  val eventFunnel: Q = Q.sql(
    "event_funnel",
    s"""WITH $funnelStageCtesSql,
      |u AS (
      |  SELECT 1 AS step, 'signup' AS stage, count(*) AS n_users FROM s1
      |  UNION ALL SELECT 2, 'view', count(*) FROM s2
      |  UNION ALL SELECT 3, 'click', count(*) FROM s3
      |  UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
      |SELECT step, stage, n_users,
      |  round(CAST(n_users AS DOUBLE)
      |    / lag(n_users) OVER (ORDER BY step), 4) AS conv_prev,
      |  round(CAST(n_users AS DOUBLE)
      |    / first_value(n_users) OVER (ORDER BY step), 4) AS conv_total
      |FROM u ORDER BY step""".stripMargin) { (s, d) =>
    val Seq(("signup", s1), ("view", s2), ("click", s3), ("purchase", s4)) =
      funnelStages(s, d)
    def cnt(df: DataFrame, step: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("stage"), col("n_users"))
    val u = cnt(s1, 1, "signup").unionAll(cnt(s2, 2, "view"))
      .unionAll(cnt(s3, 3, "click")).unionAll(cnt(s4, 4, "purchase"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    u.select(col("step"), col("stage"), col("n_users"),
        round(col("n_users").cast("double") / lag("n_users", 1).over(w), 4)
          .as("conv_prev"),
        round(col("n_users").cast("double") / first("n_users").over(w), 4)
          .as("conv_total"))
      .orderBy("step")
  }

  /** Top 3-step behavioral paths: the most common event-type triples
    * taken within a session (consecutive events ≤ 30 min apart — the
    * audit_sessionize gap rule), with each path's share of all triples —
    * the "what do users actually do" report funnels can't give (a funnel
    * fixes the sequence up front; this discovers the sequences worth
    * building funnels for).
    *
    * Scale: ONE user-keyed window over the feed (lag ×4 stacked on a
    * single exchange — the audit_sessionize distribution), per-row gap
    * filter, then a partial-agg groupBy bounded at |event types|³ paths;
    * the share join is a 1-row broadcast and top-20 is
    * TakeOrderedAndProject. Timestamps compared at exact microseconds on
    * both engines, ties broken by event_id, so path counts cannot drift. */
  val eventPaths: Q = Q.sql(
    "event_paths",
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type, 1) OVER w AS p1,
      |    lag(event_type, 2) OVER w AS p2,
      |    lag(ts, 1) OVER w AS t1,
      |    lag(ts, 2) OVER w AS t2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |p AS (SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path
      |      FROM o
      |      WHERE p2 IS NOT NULL
      |        AND epoch_ns(ts) // 1000 - epoch_ns(t1) // 1000 <= 1800000000
      |        AND epoch_ns(t1) // 1000 - epoch_ns(t2) // 1000 <= 1800000000),
      |c AS (SELECT path, count(*) AS n FROM p GROUP BY 1),
      |t AS (SELECT sum(n) AS total FROM c)
      |SELECT path, n, round(1.0 * n / total, 4) AS share
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, path LIMIT 20""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 1800000000L // 30 min in microseconds
    val o = ev(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        lag(col("event_type"), 1).over(w).as("p1"),
        lag(col("event_type"), 2).over(w).as("p2"),
        lag(col("ts"), 1).over(w).as("t1"),
        lag(col("ts"), 2).over(w).as("t2"))
    val paths = o
      .filter(col("p2").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("t1")) <= gapUs &&
        unix_micros(col("t1")) - unix_micros(col("t2")) <= gapUs)
      .select(concat(col("p2"), lit(" > "), col("p1"), lit(" > "),
        col("event_type")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
    val total = paths.agg(sum("n").as("total"))
    paths.crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        round(lit(1.0) * col("n") / col("total"), 4).as("share"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** Last-touch conversion attribution: each purchase is credited to the
    * user's most recent preceding non-purchase event within a 7-day
    * lookback — the marketing-attribution primitive funnels and paths
    * don't give (a funnel fixes the sequence; attribution asks which
    * channel ACTUALLY preceded the money). Purchases with no qualifying
    * touch are credited to 'direct'. Report per channel: conversions,
    * attributed revenue, revenue share.
    *
    * Scale: ONE user-keyed window over the feed (the audit_sessionize
    * exchange family) with a (−∞, −1] frame; the two ignore-nulls
    * last_value arms share the identical frame and CASE predicate, so
    * they read the SAME source row and (ts, channel) can never split.
    * The channel rollup is a partial-agg groupBy bounded at
    * |event types|+1 rows; the share join is a 1-row broadcast. Revenue
    * sums ride exact DECIMAL fixed-point (order-independent), so share
    * is a quotient of two already-identical doubles on both engines. */
  val eventAttribution: Q = Q.sql(
    "event_attribution",
    s"""WITH t AS (
       |  SELECT event_type, ts, value,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN ts END
       |      IGNORE NULLS) OVER w AS touch_ts,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
       |      IGNORE NULLS) OVER w AS touch_ch
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |a AS (
       |  SELECT CASE WHEN touch_ts IS NULL
       |      OR ts > touch_ts + INTERVAL 7 DAY THEN 'direct'
       |      ELSE touch_ch END AS channel,
       |    value
       |  FROM t WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT channel, count(*) AS conversions,
       |    ${Det.dsumRoundSql("value", 2)} AS revenue
       |  FROM a GROUP BY 1),
       |tot AS (SELECT ${Det.dsumSql("value")} AS total FROM a)
       |SELECT channel, conversions, revenue,
       |  round(revenue / total, 4) AS rev_share
       |FROM c CROSS JOIN tot ORDER BY channel""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nonPurchase = col("event_type") =!= "purchase"
    val touched = ev(s, d)
      .select(col("event_type"), col("ts"), col("value"),
        last(when(nonPurchase, col("ts")), ignoreNulls = true).over(w)
          .as("touch_ts"),
        last(when(nonPurchase, col("event_type")), ignoreNulls = true).over(w)
          .as("touch_ch"))
    val attributed = touched
      .filter(col("event_type") === "purchase")
      .select(
        when(col("touch_ts").isNull ||
          col("ts") > col("touch_ts") + expr("INTERVAL 7 DAYS"), "direct")
          .otherwise(col("touch_ch")).as("channel"),
        col("value"))
    val channels = attributed.groupBy("channel")
      .agg(count(lit(1)).as("conversions"),
        Det.dsumRound(col("value"), 2).as("revenue"))
    val total = attributed.agg(Det.dsum(col("value")).as("total"))
    channels.crossJoin(broadcast(total))
      .select(col("channel"), col("conversions"), col("revenue"),
        round(col("revenue") / col("total"), 4).as("rev_share"))
      .orderBy("channel")
  }

  /** Session-level event-type association matrix: for each unordered
    * type pair, the share of sessions containing BOTH and the lift
    * n_both·N / (n_a·n_b) — association (do these behaviors travel
    * together?) where event_paths gives sequence and event_funnel gives
    * one fixed order. Lift < 1 on a pair a funnel assumes adjacent is
    * the "nobody actually does both" verdict. Sessions are the
    * audit_sessionize 30-minute-gap rule, so all three session views
    * agree on the unit.
    *
    * Scale: ONE user-keyed session window (the sessionize exchange), a
    * distinct (user, session, type) partial agg, and a self-join keyed
    * on (user, session) — per-session fan-out bounded by |types|, so
    * the pair join is linear in sessions; the pair rollup is ≤ |types|²
    * rows, type totals broadcast. Lift = n_both·N / (n_a·n_b) — one
    * division of exact < 2⁵³ integer products, identical IEEE result in
    * both engines. */
  val eventCooccurrence: Q = Q.sql(
    "event_cooccurrence",
    """WITH marked AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |             OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
      |         THEN 1
      |         WHEN lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_type,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked),
      |st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
      |        FROM (SELECT DISTINCT user_id, session_id FROM st)),
      |tc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
      |       FROM st GROUP BY 1),
      |pairs AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM st a JOIN st b
      |    ON a.user_id = b.user_id AND a.session_id = b.session_id
      |   AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_both,
      |  round(1.0 * n_both / n_sessions, 4) AS support,
      |  round(1.0 * n_both * n_sessions / (ta.n_t * tb.n_t), 4) AS lift
      |FROM pairs
      |JOIN tc ta ON ta.event_type = type_a
      |JOIN tc tb ON tb.event_type = type_b
      |CROSS JOIN tot
      |ORDER BY type_a, type_b""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val secs = floor(unix_micros(col("ts")) / 1000000L).cast("long")
    val marked = ev(s, d)
      .withColumn("new_session",
        when(secs - lag(secs, 1).over(w) > 1800, 1)
          .when(lag(col("event_id"), 1).over(w).isNull, 1)
          .otherwise(0))
    val st = marked
      .withColumn("session_id", sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      .select("user_id", "session_id", "event_type").distinct()
    val tot = st.select("user_id", "session_id").distinct()
      .agg(count(lit(1)).cast("long").as("n_sessions"))
    val tc = st.groupBy("event_type").agg(count(lit(1)).cast("long").as("n_t"))
    val pairs = st.select(col("user_id"), col("session_id"),
        col("event_type").as("type_a"))
      .join(st.select(col("user_id"), col("session_id"),
        col("event_type").as("type_b")), Seq("user_id", "session_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).cast("long").as("n_both"))
    pairs
      .join(broadcast(tc.select(col("event_type").as("type_a"),
        col("n_t").as("na"))), Seq("type_a"))
      .join(broadcast(tc.select(col("event_type").as("type_b"),
        col("n_t").as("nb"))), Seq("type_b"))
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_both"),
        round(lit(1.0) * col("n_both") / col("n_sessions"), 4).as("support"),
        round(lit(1.0) * col("n_both") * col("n_sessions")
          / (col("na") * col("nb")), 4).as("lift"))
      .orderBy("type_a", "type_b")
  }

  /** Cohort lifetime-value curve: users cohorted by first-purchase day
    * (the event_retention cohorts), revenue accumulated per cohort by
    * week offset, normalized per cohort user — the monetary counterpart
    * of the retention matrix (retention says users came back; LTV says
    * what that was worth, and when the curve flattens, what a user is
    * ultimately worth).
    *
    * Scale: the feed collapses to (cohort, week) revenue cells first
    * (user-keyed cohort join on the retention exchange family, then a
    * partial agg bounded at |days|×|weeks|); the cumulative window runs
    * ONLY on that bounded aggregate, summing already-rounded weekly
    * revenues as DECIMAL (order-independent); cohort sizes broadcast. */
  val eventLtv: Q = Q.sql(
    "event_ltv",
    s"""WITH ev AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, value
       |  FROM events WHERE event_type = 'purchase'),
       |f AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
       |c AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
       |      FROM f GROUP BY 1),
       |r AS (SELECT f.cohort_day,
       |        CAST(date_diff('day', f.cohort_day, ev.day) AS INT) // 7
       |          AS week_offset,
       |        ev.value
       |      FROM ev JOIN f ON ev.user_id = f.user_id),
       |a AS (SELECT cohort_day, week_offset,
       |        ${Det.dsumRoundSql("value", 2)} AS week_revenue
       |      FROM r GROUP BY 1, 2),
       |m AS (SELECT cohort_day, week_offset, week_revenue,
       |        CAST(sum(CAST(week_revenue AS DECIMAL(28,6))) OVER (
       |          PARTITION BY cohort_day ORDER BY week_offset) AS DOUBLE)
       |          AS cum_revenue
       |      FROM a)
       |SELECT m.cohort_day, m.week_offset, c.cohort_users,
       |  m.week_revenue, m.cum_revenue,
       |  round(m.cum_revenue / c.cohort_users, 4) AS ltv_per_user
       |FROM m JOIN c ON m.cohort_day = c.cohort_day
       |ORDER BY m.cohort_day, m.week_offset""".stripMargin) { (s, d) =>
    val ev0 = ev(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val first = ev0.groupBy("user_id").agg(min("day").as("cohort_day"))
    val cohorts = first.groupBy("cohort_day")
      .agg(count(lit(1)).cast("long").as("cohort_users"))
    val weekly = ev0.join(first, Seq("user_id"))
      .select(col("cohort_day"),
        expr("cast(datediff(day, cohort_day) as int) div 7").cast("int")
          .as("week_offset"),
        col("value"))
      .groupBy("cohort_day", "week_offset")
      .agg(Det.dsumRound(col("value"), 2).as("week_revenue"))
    val w = Window.partitionBy("cohort_day").orderBy("week_offset")
    weekly
      .withColumn("cum_revenue",
        sum(col("week_revenue").cast("decimal(28,6)")).over(w).cast("double"))
      .join(broadcast(cohorts), Seq("cohort_day"))
      .select(col("cohort_day"), col("week_offset"), col("cohort_users"),
        col("week_revenue"), col("cum_revenue"),
        round(col("cum_revenue") / col("cohort_users"), 4).as("ltv_per_user"))
      .orderBy("cohort_day", "week_offset")
  }

  /** Markov steady-state of the in-session event-type chain: where user
    * attention SETTLES, vs where traffic merely lands (event_paths shows
    * the top raw sequences; the stationary distribution weights each
    * state by long-run visit share, so a state that is every path's hub
    * ranks above a state with many one-shot entries). Transition counts
    * use event_paths' session convention (consecutive events per user,
    * ≤ 30 min apart); π starts uniform and takes 3 power-iteration
    * rounds π·P — enough to separate hub from periphery on a 5-state
    * chain, and exactly replayable.
    *
    * Determinism: π lives in INTEGER micro-units; each round's
    * contribution π·c/r is half-up integer division (2πc + r) div (2r)
    * summed exactly, so both engines produce identical integers — no
    * float enters the iteration. The published delta_e6 = stationary −
    * traffic share (also half-up micro-units) is the "destination vs
    * entry point" verdict.
    *
    * The 3-round bound is an ACCURACY assumption, not an output
    * contract, so the op publishes its own convergence evidence
    * (the ann_graph_search posture): iter_gap_e6 = |π₃ − π₂| per state
    * — a reader of the artifact sees exactly how settled the "steady
    * state" is instead of trusting the unroll depth silently.
    *
    * Scale: ONE user-keyed window over the feed (the event_paths
    * exchange) collapses to the ≤ |types|² transition matrix; the three
    * iteration rounds and all joins run on that bounded frame with π
    * broadcast — the corpus is never touched again. */
  val eventMarkov: Q = {
    val gapUs = 1800000000L
    def roundCte(prev: String, out: String) =
      s"""$out AS (
         |  SELECT tr.dst AS event_type,
         |    CAST(sum((2 * p.pe6 * tr.c + r.r) // (2 * r.r)) AS BIGINT) AS pe6
         |  FROM tr JOIN $prev p ON tr.src = p.event_type
         |    JOIN r ON tr.src = r.src
         |  GROUP BY 1)""".stripMargin
    Q.sql(
      "event_markov",
      s"""WITH o AS (
        |  SELECT event_type, ts, event_id,
        |    lag(event_type) OVER w AS p1, lag(ts) OVER w AS t1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |tr AS (
        |  SELECT p1 AS src, event_type AS dst, CAST(count(*) AS BIGINT) AS c
        |  FROM o
        |  WHERE p1 IS NOT NULL
        |    AND epoch_ns(ts) // 1000 - epoch_ns(t1) // 1000 <= $gapUs
        |  GROUP BY 1, 2),
        |r AS (SELECT src, CAST(sum(c) AS BIGINT) AS r FROM tr GROUP BY 1),
        |st AS (SELECT DISTINCT event_type FROM events),
        |kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
        |p0 AS (SELECT event_type, CAST(1000000 // k AS BIGINT) AS pe6
        |       FROM st CROSS JOIN kk),
        |${roundCte("p0", "i1")},
        |${roundCte("i1", "i2")},
        |${roundCte("i2", "i3")},
        |ev AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM ev)
        |SELECT ev.event_type, ev.n AS n_events,
        |  CAST((2 * ev.n * 1000000 + total) // (2 * total) AS BIGINT) AS traffic_e6,
        |  coalesce(i3.pe6, 0) AS stationary_e6,
        |  abs(coalesce(i3.pe6, 0) - coalesce(i2.pe6, 0)) AS iter_gap_e6,
        |  coalesce(i3.pe6, 0)
        |    - CAST((2 * ev.n * 1000000 + total) // (2 * total) AS BIGINT) AS delta_e6
        |FROM ev CROSS JOIN tot
        |  LEFT JOIN i3 ON ev.event_type = i3.event_type
        |  LEFT JOIN i2 ON ev.event_type = i2.event_type
        |ORDER BY ev.event_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val o = ev(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("p1"),
          lag(col("ts"), 1).over(w).as("t1"))
      val tr = o
        .filter(col("p1").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("t1")) <= gapUs)
        .groupBy(col("p1").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).cast("long").as("c"))
      val r = tr.groupBy("src").agg(sum("c").cast("long").as("r"))
      val st = ev(s, d).select("event_type").distinct()
      def step(pi: DataFrame): DataFrame = tr
        .join(broadcast(pi.withColumnRenamed("event_type", "src")), Seq("src"))
        .join(broadcast(r), Seq("src"))
        .groupBy(col("dst").as("event_type"))
        .agg(sum(expr("(2 * pe6 * c + r) div (2 * r)")).cast("long").as("pe6"))
      val pi0 = st
        .crossJoin(broadcast(st.agg(count(lit(1)).cast("long").as("k"))))
        .select(col("event_type"), expr("1000000 div k").cast("long").as("pe6"))
      // round 2 and round 3 are BOTH kept: the published iter_gap_e6 is
      // the per-state |π₃ − π₂| convergence readout
      val pi2 = step(step(pi0))
      val pi3 = step(pi2)
      val evAgg = ev(s, d).groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"))
      val traffic = expr("(2 * n * 1000000 + total) div (2 * total)").cast("long")
      evAgg
        .crossJoin(broadcast(evAgg.agg(sum("n").cast("long").as("total"))))
        .join(pi3, Seq("event_type"), "left")
        .join(pi2.withColumnRenamed("pe6", "pe6_prev"), Seq("event_type"), "left")
        .select(col("event_type"), col("n").as("n_events"),
          traffic.as("traffic_e6"),
          coalesce(col("pe6"), lit(0L)).as("stationary_e6"),
          abs(coalesce(col("pe6"), lit(0L)) - coalesce(col("pe6_prev"), lit(0L)))
            .as("iter_gap_e6"),
          (coalesce(col("pe6"), lit(0L)) - traffic).as("delta_e6"))
        .orderBy("event_type")
    }
  }

  /** Activity-concentration report: Gini coefficient + Lorenz cut points
    * (top-1%, top-10%, bottom-50% shares) of events per user — the
    * power-user/inequality readout behind capacity planning and abuse
    * review (a Gini jump means a few accounts now drive the load; the
    * retention/funnel averages can't see that). All order statistics are
    * EXACT: the per-user counts collapse to a (count, n_users) histogram
    * (token_length_quantiles' domain-boundedness — counts are small
    * integers at any scale), positions come from cumulative sums over
    * that bounded frame, and the grouped-Gini identity
    * Σᵢ i·cᵢ = Σ_groups c·(nu·cu_prev + nu(nu+1)/2) keeps everything in
    * BIGINT; percentile cut shares split the boundary group exactly.
    * Every published value is one rounded quotient of exact integers.
    *
    * Scale: one user-keyed partial agg (the retention exchange family)
    * → bounded histogram; every window here runs on the histogram. */
  val eventGini: Q = {
    // shared final-math strings: explicit DOUBLE casts at every leaf so
    // both engines build the identical IEEE expression tree (a bare 1.0
    // literal is DECIMAL in Spark SQL and would keep the whole quotient
    // in decimal space on one side only)
    def dd(x: String) = s"CAST($x AS DOUBLE)"
    val giniF = s"round(2e0 * ${dd("gnum")} / (${dd("n")} * ${dd("tot")})" +
      s" - (${dd("n")} + 1e0) / ${dd("n")}, 4)"
    def shareF(x: String) = s"round(${dd(x)} / ${dd("tot")}, 4)"
    Q.sql(
      "event_gini",
      s"""WITH uc AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
      |          FROM events GROUP BY 1),
      |h AS (SELECT c, CAST(count(*) AS BIGINT) AS nu FROM uc GROUP BY 1),
      |a AS (
      |  SELECT c, nu,
      |    sum(nu) OVER (ORDER BY c) AS cu,
      |    sum(nu * c) OVER (ORDER BY c) AS ce
      |  FROM h),
      |t AS (SELECT CAST(max(cu) AS BIGINT) AS n, CAST(max(ce) AS BIGINT) AS tot,
      |        CAST(sum(c * (nu * (cu - nu) + nu * (nu + 1) // 2)) AS BIGINT) AS gnum
      |      FROM a),
      |cuts AS (
      |  -- each CASE fires on exactly ONE histogram row (the boundary
      |  -- group straddling the cut); the partial term splits that group
      |  SELECT
      |    sum(CASE WHEN cu - nu < n // 2 AND cu >= n // 2
      |          THEN ce - (cu - n // 2) * c END) AS bot50_ev,
      |    sum(CASE WHEN n - cu < (n + 9) // 10 AND n - cu + nu >= (n + 9) // 10
      |          THEN tot - ce + ((n + 9) // 10 - (n - cu)) * c END) AS top10_ev,
      |    sum(CASE WHEN n - cu < (n + 99) // 100 AND n - cu + nu >= (n + 99) // 100
      |          THEN tot - ce + ((n + 99) // 100 - (n - cu)) * c END) AS top1_ev
      |  FROM a CROSS JOIN t)
      |SELECT n AS n_users, tot AS n_events,
      |  $giniF AS gini,
      |  ${shareF("top1_ev")} AS top1_share,
      |  ${shareF("top10_ev")} AS top10_share,
      |  ${shareF("bot50_ev")} AS bottom50_share
      |FROM t CROSS JOIN cuts""".stripMargin) { (s, d) =>
    val h = ev(s, d).groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy("c").agg(count(lit(1)).cast("long").as("nu"))
    val byC = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val a = h
      .withColumn("cu", sum("nu").over(byC))
      .withColumn("ce", sum(col("nu") * col("c")).over(byC))
    val t = a.agg(max("cu").cast("long").as("n"), max("ce").cast("long").as("tot"),
      sum(expr("c * (nu * (cu - nu) + nu * (nu + 1) div 2)")).cast("long").as("gnum"))
    val cuts = a.crossJoin(broadcast(t)).agg(
      sum(expr("CASE WHEN cu - nu < n div 2 AND cu >= n div 2 " +
        "THEN ce - (cu - n div 2) * c END")).as("bot50_ev"),
      sum(expr("CASE WHEN n - cu < (n + 9) div 10 AND n - cu + nu >= (n + 9) div 10 " +
        "THEN tot - ce + ((n + 9) div 10 - (n - cu)) * c END")).as("top10_ev"),
      sum(expr("CASE WHEN n - cu < (n + 99) div 100 AND n - cu + nu >= (n + 99) div 100 " +
        "THEN tot - ce + ((n + 99) div 100 - (n - cu)) * c END")).as("top1_ev"))
    t.crossJoin(broadcast(cuts)).selectExpr(
      "n AS n_users", "tot AS n_events",
      s"$giniF AS gini",
      s"${shareF("top1_ev")} AS top1_share",
      s"${shareF("top10_ev")} AS top10_share",
      s"${shareF("bot50_ev")} AS bottom50_share")
    }
  }

  /** DAU / WAU / stickiness time series — the canonical engagement
    * dashboard (stickiness = DAU/WAU: how much of the weekly audience
    * shows up daily; retention matrices answer "do they come back",
    * this answers "how habitually"). The trailing-7-day distinct count
    * is made exact WITHOUT per-day distinct-over-window state: each
    * (user, active day) pair explodes into the ≤ 7 future days it
    * covers, and WAU(d) = distinct (user) among covers of d — a
    * partial-aggregable distinct on a bounded ×7 fan-out, never a
    * sliding distinct window. Days before a full week of history are
    * published with their short-window WAU (no NULL fiction — the spec
    * pins the ramp).
    *
    * Scale: (user, day) distinct is one user-keyed partial agg; the
    * cover explode multiplies that bounded frame by ≤ 7; both rollups
    * are ≤ |days| frames joined on the day grid. */
  val eventDauWau: Q = Q.sql(
    "event_dau_wau",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
      |cov AS (SELECT DISTINCT user_id, day + CAST(off AS INTEGER) AS day
      |        FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS off)),
      |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau FROM cov GROUP BY 1)
      |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
      |  round(1.0 * dau.dau / wau.wau, 4) AS stickiness
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY day""".stripMargin) { (s, d) =>
    val ud = ev(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).cast("long").as("dau"))
    val cov = ud
      .withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"), expr("date_add(day, off)").as("day"))
      .distinct()
    val wau = cov.groupBy("day").agg(count(lit(1)).cast("long").as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(lit(1.0) * col("dau") / col("wau"), 4).as("stickiness"))
      .orderBy("day")
  }

  /** Funnel transition-latency quantiles: per adjacent stage pair of the
    * LIVE event_funnel machinery, the p50/p90/max minutes a converting
    * user takes — the time dimension the funnel's conversion COUNTS
    * hide (a stage can convert 90% of users but stall them for hours;
    * SLA and nudge timing read this table, not conv_prev). Composed
    * from the shared stage frames, so a converted user here is exactly
    * a converted user there.
    *
    * Exactness: the 24 h stage window bounds latency to ≤ 1440 whole
    * minutes, so quantiles are cumulative-rank picks on the (transition,
    * minute) histogram — token_length_quantiles' domain-boundedness,
    * handed here by the funnel's own window rule.
    *
    * Scale: stage frames are user-keyed aggregates on one exchange
    * family; the per-transition join is user-to-user; histogram ≤
    * 3×1441 cells. */
  val eventStageLatency: Q = {
    def qSel(p: String, alias: String) =
      s"CAST(min(CASE WHEN cum >= CAST(ceil($p * nd) AS BIGINT) THEN v END) AS BIGINT) AS $alias"
    Q.sql(
      "event_stage_latency",
      s"""WITH $funnelStageCtesSql,
        |pairs AS (
        |  SELECT 2 AS step, 'signup>view' AS transition,
        |    (CAST(floor(epoch(s2.t)) AS BIGINT)
        |      - CAST(floor(epoch(s1.t)) AS BIGINT)) // 60 AS v
        |  FROM s2 JOIN s1 ON s2.user_id = s1.user_id
        |  UNION ALL
        |  SELECT 3, 'view>click',
        |    (CAST(floor(epoch(s3.t)) AS BIGINT)
        |      - CAST(floor(epoch(s2.t)) AS BIGINT)) // 60
        |  FROM s3 JOIN s2 ON s3.user_id = s2.user_id
        |  UNION ALL
        |  SELECT 4, 'click>purchase',
        |    (CAST(floor(epoch(s4.t)) AS BIGINT)
        |      - CAST(floor(epoch(s3.t)) AS BIGINT)) // 60
        |  FROM s4 JOIN s3 ON s4.user_id = s3.user_id),
        |h AS (SELECT step, transition, v, CAST(count(*) AS BIGINT) AS cnt
        |      FROM pairs GROUP BY 1, 2, 3),
        |t AS (
        |  SELECT step, transition, v, cnt,
        |    sum(cnt) OVER (PARTITION BY step ORDER BY v) AS cum,
        |    sum(cnt) OVER (PARTITION BY step) AS nd
        |  FROM h)
        |SELECT step, transition, CAST(max(nd) AS BIGINT) AS n_converted,
        |  ${qSel("0.5", "p50_min")}, ${qSel("0.9", "p90_min")},
        |  CAST(max(v) AS BIGINT) AS max_min
        |FROM t GROUP BY step, transition ORDER BY step""".stripMargin) { (s, d) =>
      val stages = funnelStages(s, d)
      def leg(step: Int, name: String, to: DataFrame, from: DataFrame): DataFrame =
        to.select(col("user_id"), col("t").as("t_to"))
          .join(from.select(col("user_id"), col("t").as("t_from")), Seq("user_id"))
          .select(lit(step).as("step"), lit(name).as("transition"),
            expr("(unix_timestamp(t_to) - unix_timestamp(t_from)) div 60").as("v"))
      val pairs = leg(2, "signup>view", stages(1)._2, stages(0)._2)
        .unionByName(leg(3, "view>click", stages(2)._2, stages(1)._2))
        .unionByName(leg(4, "click>purchase", stages(3)._2, stages(2)._2))
      val byStep = Window.partitionBy("step")
      val t = pairs.groupBy("step", "transition", "v")
        .agg(count(lit(1)).cast("long").as("cnt"))
        .withColumn("cum", sum("cnt").over(byStep.orderBy("v")))
        .withColumn("nd", sum("cnt").over(byStep))
      def q(p: Double, alias: String) =
        min(when(col("cum") >= ceil(lit(p) * col("nd")).cast("long"), col("v")))
          .cast("long").as(alias)
      t.groupBy("step", "transition")
        .agg(max("nd").cast("long").as("n_converted"),
          q(0.5, "p50_min"), q(0.9, "p90_min"),
          max("v").cast("long").as("max_min"))
        .orderBy("step")
    }
  }

  /** Daily peak concurrent sessions — the capacity-planning number
    * (licence seats, connection pools, autoscaler head-room) none of the
    * volume reports give: volume says how MUCH happened, concurrency says
    * how much happened AT ONCE. Sessions are the standard 30-min-gap
    * sessionization (the event_paths/audit_sessionize frame); a session
    * is active from its first through its last event inclusive, with
    * starts applied before ends at the same instant.
    *
    * Shape: classic sweep-line, decomposed to stay partition-parallel at
    * any feed size — endpoints aggregate per timestamp (±1 deltas), the
    * within-day running sum rides a window PARTITIONED BY day (never one
    * global ordering over the feed), and the cross-day carry-in is a
    * prefix sum over the bounded |days| day-ledger only. Per day: open
    * sessions at midnight (carry_in), starts, ends, the peak, and the
    * midnight-close count (end_of_day = next day's carry_in — the
    * conservation line the spec pins). Exact integers throughout. */
  val eventConcurrency: Q = Q.sql(
    "event_concurrency",
    """WITH m AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR epoch_ns(ts) // 1000 - epoch_ns(lag(ts) OVER w) // 1000 > 1800000000
      |      THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sid AS (SELECT user_id, ts,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
      |  FROM m),
      |sess AS (SELECT user_id, sess, min(ts) AS st, max(ts) AS en
      |         FROM sid GROUP BY 1, 2),
      |pt AS (SELECT ts, CAST(sum(pos) AS BIGINT) AS pos, CAST(sum(neg) AS BIGINT) AS neg
      |       FROM (SELECT st AS ts, 1 AS pos, 0 AS neg FROM sess
      |             UNION ALL SELECT en, 0, 1 FROM sess)
      |       GROUP BY ts),
      |d AS (SELECT CAST(ts AS DATE) AS day, ts, pos, neg, pos - neg AS net FROM pt),
      |c AS (SELECT day, ts, pos, net,
      |        sum(net) OVER (PARTITION BY day ORDER BY ts) - net AS cbd
      |      FROM d),
      |dl AS (SELECT day, CAST(sum(net) AS BIGINT) AS day_net,
      |         CAST(sum(pos) AS BIGINT) AS n_started,
      |         CAST(sum(neg) AS BIGINT) AS n_ended
      |       FROM d GROUP BY day),
      |dc AS (SELECT day, day_net, n_started, n_ended,
      |         CAST(coalesce(sum(day_net) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |           AS carry_in
      |       FROM dl),
      |pk AS (SELECT c.day, CAST(max(dc.carry_in + c.cbd + c.pos) AS BIGINT) AS peak
      |       FROM c JOIN dc ON c.day = dc.day GROUP BY c.day)
      |SELECT dc.day, dc.carry_in, dc.n_started, dc.n_ended,
      |  pk.peak AS peak_concurrency,
      |  dc.carry_in + dc.day_net AS end_of_day
      |FROM dc JOIN pk ON dc.day = pk.day ORDER BY dc.day""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 1800000000L
    val sess = ev(s, d)
      .withColumn("ns",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs,
          1).otherwise(0))
      .withColumn("sess", sum("ns").over(w))
      .groupBy("user_id", "sess").agg(min("ts").as("st"), max("ts").as("en"))
    val pt = sess.select(col("st").as("ts"), lit(1).as("pos"), lit(0).as("neg"))
      .unionAll(sess.select(col("en").as("ts"), lit(0).as("pos"), lit(1).as("neg")))
      .groupBy("ts")
      .agg(sum("pos").cast("long").as("pos"), sum("neg").cast("long").as("neg"))
    val dd = pt.select(to_date(col("ts")).as("day"), col("ts"), col("pos"),
      col("neg"), (col("pos") - col("neg")).as("net"))
    val dayW = Window.partitionBy("day").orderBy("ts")
    val c = dd.select(col("day"), col("ts"), col("pos"), col("net"),
      (sum("net").over(dayW) - col("net")).as("cbd"))
    val dl = dd.groupBy("day").agg(
      sum("net").cast("long").as("day_net"),
      sum("pos").cast("long").as("n_started"),
      sum("neg").cast("long").as("n_ended"))
    // bounded |days| ledger: the only globally-ordered window in the op
    val ledgerW = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val dc = dl.select(col("day"), col("day_net"), col("n_started"), col("n_ended"),
      coalesce(sum("day_net").over(ledgerW), lit(0L)).cast("long").as("carry_in"))
    val pk = c.join(broadcast(dc.select("day", "carry_in")), Seq("day"))
      .groupBy("day")
      .agg(max(col("carry_in") + col("cbd") + col("pos")).cast("long").as("peak"))
    dc.join(pk, Seq("day"))
      .select(col("day"), col("carry_in"), col("n_started"), col("n_ended"),
        col("peak").as("peak_concurrency"),
        (col("carry_in") + col("day_net")).as("end_of_day"))
      .orderBy("day")
  }

  /** Arrival-process health per event type: the index of dispersion
    * D = Var(hourly count)/Mean(hourly count) over the feed's full hour
    * grid — the classic over/under-dispersion test (D ≈ 1 ⇒
    * Poisson-like arrivals; D ≫ 1 ⇒ bursty/batchy traffic that needs
    * queueing headroom; D ≪ 1 ⇒ scheduler-regular). This is the
    * capacity-planning readout behind rate alerts: stream_rate_alert
    * flags WHEN a window deviates, this says whether deviation is the
    * process's normal character. Zero-count hours COUNT (an absent hour
    * is data, not a gap to skip), so every type is measured on the same
    * grid.
    *
    * Scale shape: counts-based on purpose — a gap-based fit would need
    * a per-type window over the raw feed (the low-cardinality-partition
    * anti-pattern this file's header forbids); instead ONE
    * partial-aggregating groupBy to (type, hour), a bounded
    * |types|×|hours| grid join (both sides broadcast-scale), and exact
    * integer moments: D = (H·Σc² − n²)/(H·n), all-integer until one
    * division rounded once; the verdict bands compare the ROUNDED D. */
  val eventDispersion: Q = Q.sql(
    "event_dispersion",
    """WITH h AS (SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr FROM events),
      |gh AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
      |hours AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM gh),
      |types AS (SELECT DISTINCT event_type FROM h),
      |c AS (SELECT event_type, hr, CAST(count(*) AS BIGINT) AS c
      |      FROM h GROUP BY 1, 2),
      |g AS (SELECT t.event_type, hh.hr, coalesce(c.c, 0) AS c
      |      FROM types t CROSS JOIN hours hh
      |      LEFT JOIN c ON c.event_type = t.event_type AND c.hr = hh.hr),
      |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
      |        CAST(sum(c) AS BIGINT) AS n, CAST(sum(c * c) AS BIGINT) AS s2
      |      FROM g GROUP BY 1),
      |r AS (SELECT event_type, n, n_hours,
      |        round((1e0 * n) / n_hours, 4) AS rate_per_hour,
      |        round(CAST(n_hours * s2 - n * n AS DOUBLE)
      |          / (CAST(n_hours AS DOUBLE) * n), 4) AS dispersion
      |      FROM a)
      |SELECT event_type, n AS n_events, n_hours, rate_per_hour, dispersion,
      |  CASE WHEN dispersion < 0.8 THEN 'regular'
      |       WHEN dispersion <= 1.2 THEN 'poisson-like'
      |       ELSE 'bursty' END AS verdict
      |FROM r ORDER BY event_type""".stripMargin) { (s, d) =>
    // floor at BOTH steps (not `div`, which truncates toward zero) so a
    // pre-1970 timestamp lands in the same hour bucket as DuckDB's `//`
    val h = ev(s, d).select(col("event_type"),
      expr("floor(floor(unix_micros(ts) / 1000000) / 3600)")
        .cast("long").as("hr"))
    val gh = h.agg(min("hr").as("h0"), max("hr").as("h1"))
    val hours = gh.select(explode(expr("sequence(h0, h1)")).as("hr"))
    val types = h.select("event_type").distinct()
    val c = h.groupBy("event_type", "hr").agg(count(lit(1)).as("c"))
    val g = types.crossJoin(broadcast(hours))
      .join(broadcast(c), Seq("event_type", "hr"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
    g.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_hours"),
        sum("c").cast("long").as("n"),
        sum(col("c") * col("c")).cast("long").as("s2"))
      .select(col("event_type"), col("n").as("n_events"), col("n_hours"),
        round(lit(1e0) * col("n") / col("n_hours"), 4).as("rate_per_hour"),
        round((col("n_hours") * col("s2") - col("n") * col("n")).cast("double")
          / (col("n_hours").cast("double") * col("n")), 4).as("dispersion"))
      .withColumn("verdict",
        when(col("dispersion") < 0.8, "regular")
          .when(col("dispersion") <= 1.2, "poisson-like")
          .otherwise("bursty"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(eventRetention, eventFunnel, eventPaths,
    eventAttribution, eventCooccurrence, eventLtv, eventMarkov, eventGini,
    eventDauWau, eventStageLatency, eventConcurrency, eventDispersion)
}
