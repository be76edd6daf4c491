package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics family over the `events` stream: batch sessionization,
  * funnel conversion, cohort retention, and path analysis — the four
  * queries every product-analytics engine ships and this registry lacked
  * (the streaming session window exists at StreamingOps.scala:62; this is
  * the BATCH shape run over historical data).
  *
  * 100-TB design note, shared by the whole family: every op's heavy
  * phase is keyed by `user_id` and nothing else. The session assignment
  * (lag + running sum), the per-session row numbering, and the
  * session-level aggregation all declare window/grouping keys whose
  * prefix is `user_id`, so Catalyst satisfies them from ONE hash
  * exchange on `user_id` — `HashPartitioning(user_id)` clusters every
  * `(user_id, session_seq)` requirement, and EnsureRequirements inserts
  * no second shuffle (pinned in EventSpec). Per-user state is bounded
  * (a user's events sort in one partition — the same assumption every
  * production sessionizer makes; a user with billions of events is a
  * bot to quarantine upstream, not a partition to support). The final
  * funnel/retention/path outputs are per-stage / per-cohort-week /
  * top-20 aggregates: tiny regardless of input scale.
  */
object EventOps {

  /** Session gap: a new session starts after >8 idle hours (the synthetic
    * corpus' median inter-event gap is ~7.3 h, so this yields real
    * multi-event sessions with plenty of boundaries to exercise).
    */
  private[graft] val sessionGapUs = 28800000000L
  private val sessionGapSql = s"${sessionGapUs / 3600000000L} HOUR"

  /** Gap-based session assignment over any frame carrying
    * (user_id, event_id, event_type, ts). ONE definition engine-wide:
    * delegates to StreamingOps.sessionizeBatch (lag + running-sum window
    * trick, strictly-greater-than-gap starts a session), which the
    * streaming parity suite pins equal to Structured Streaming's
    * session_window — so batch analytics and the live pipeline can never
    * disagree on what a session is.
    */
  private[graft] def assignSessions(ev: DataFrame): DataFrame =
    StreamingOps.sessionizeBatch(ev, gap = sessionGapSql)
      .withColumnRenamed("session_id", "session_seq")
      .drop("prev_ts", "new_s")

  /** The events table sessionized, timestamps as epoch microseconds
    * (the Spark/DuckDB-portable integer form).
    */
  private def sessionEvents(s: SparkSession, d: String): DataFrame =
    assignSessions(T.events(s, d).select("user_id", "event_id", "event_type", "ts"))
      .withColumn("us", expr("unix_micros(CAST(ts AS TIMESTAMP))"))

  /** DuckDB twin of sessionEvents: CTEs ending in `ss(user_id, event_id,
    * event_type, us, session_seq)`. Same lag/running-sum structure; the
    * running sum is cast to BIGINT to match Spark's sum-of-long.
    */
  private val oSessions: String =
    "se AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
      "sm AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > " +
      s"$sessionGapUs THEN 1 ELSE 0 END AS is_new FROM se " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), " +
      "ss AS (SELECT user_id, event_id, event_type, us, " +
      "CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq FROM sm)"

  /** Funnel SQL, identical text on both engines modulo the epoch-micros
    * spelling and the integer-division operator. Stage semantics are the
    * strict ORDERED funnel: a click only counts if it happens AFTER the
    * user's first view, a purchase only AFTER that qualifying click —
    * min-ts joins, not mere presence (a user who purchases before ever
    * clicking does not convert). Each stage is a groupBy-user aggregate
    * joined to the previous stage on user_id: three shuffles on the same
    * key, each strictly shrinking, final output exactly 3 rows.
    */
  private[graft] def funnelSql(spark: Boolean): String = {
    val us = if (spark) "unix_micros(CAST(ts AS TIMESTAMP))" else "epoch_us(ts)"
    val idiv = if (spark) "div" else "//"
    s"WITH ev AS (SELECT user_id, event_type, $us AS us FROM events), " +
      "s1 AS (SELECT user_id, min(us) AS us1 FROM ev WHERE event_type = 'view' GROUP BY user_id), " +
      "s2 AS (SELECT ev.user_id, min(ev.us) AS us2 FROM ev JOIN s1 ON ev.user_id = s1.user_id " +
      "WHERE ev.event_type = 'click' AND ev.us > s1.us1 GROUP BY ev.user_id), " +
      "s3 AS (SELECT ev.user_id, min(ev.us) AS us3 FROM ev JOIN s2 ON ev.user_id = s2.user_id " +
      "WHERE ev.event_type = 'purchase' AND ev.us > s2.us2 GROUP BY ev.user_id), " +
      "c AS (SELECT 1 AS stage, 'view' AS step, count(*) AS n_users FROM s1 " +
      "UNION ALL SELECT 2, 'click_after_view', count(*) FROM s2 " +
      "UNION ALL SELECT 3, 'purchase_after_click', count(*) FROM s3) " +
      // greatest(1, ...) so an empty corpus (all stages 0) degrades to
      // 0 ppm instead of an ANSI divide-by-zero
      s"SELECT stage, step, n_users, CAST(n_users * 1000000 $idiv greatest(1, max(n_users) OVER ()) " +
      "AS BIGINT) AS conv_ppm FROM c ORDER BY stage"
  }

  /** Cohort retention SQL: cohort = week (vs the fixed 2024-01-01 anchor,
    * NOT ISO weeks — engines disagree on week-of-year edges, day counts
    * from a literal anchor they cannot) of the user's first event;
    * retention = distinct users active k weeks later, as ppm of the
    * cohort's week-0 size (every cohort has a week-0 row by
    * construction: the first event itself is active at offset 0).
    */
  private[graft] def cohortSql(spark: Boolean): String = {
    val wk =
      if (spark) "CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') AS BIGINT) div 7"
      else "datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7"
    val idiv = if (spark) "div" else "//"
    s"WITH ev AS (SELECT user_id, $wk AS wk FROM events), " +
      "f AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id), " +
      "act AS (SELECT DISTINCT ev.user_id, f.cohort_week, ev.wk - f.cohort_week AS week_offset " +
      "FROM ev JOIN f ON ev.user_id = f.user_id WHERE ev.wk - f.cohort_week <= 4), " +
      "r AS (SELECT cohort_week, week_offset, count(*) AS n_active FROM act GROUP BY 1, 2) " +
      "SELECT cohort_week, week_offset, n_active, " +
      s"CAST(n_active * 1000000 $idiv max(CASE WHEN week_offset = 0 THEN n_active END) " +
      "OVER (PARTITION BY cohort_week) AS BIGINT) AS retention_ppm " +
      "FROM r ORDER BY cohort_week, week_offset"
  }

  /** The sessionize oracle — shared verbatim by `rel_sessionize` and
    * `rel_sessionize_incremental`: incremental maintenance must equal
    * the full recompute, so they are oracle-checked against the SAME
    * full-recompute SQL.
    */
  private val oSessionize: String =
    s"WITH $oSessions SELECT user_id, session_seq, count(*) AS n_events, " +
      "min(us) AS start_us, (max(us) - min(us)) // 1000000 AS duration_sec " +
      "FROM ss GROUP BY 1, 2 ORDER BY user_id, session_seq"

  val ops: Seq[Op] = Seq(

    // Gap-based batch sessionization: the inverse of the streaming
    // session window — run over historical data, it recovers every
    // session with exact boundaries (no watermark approximation).
    Op("rel_sessionize",
      (s, d) => sessionEvents(s, d)
        .groupBy("user_id", "session_seq")
        .agg(count(lit(1)).as("n_events"),
          min("us").as("start_us"), max("us").as("end_us"))
        .withColumn("duration_sec", expr("(end_us - start_us) div 1000000"))
        .select("user_id", "session_seq", "n_events", "start_us", "duration_sec")
        .orderBy("user_id", "session_seq"),
      Some(oSessionize),
      doc = "Gap-based sessionization (8h idle): lag + running-sum session " +
        "ordinal, per-session count/start/duration; one user_id shuffle " +
        "serves both window passes and the aggregate."),

    // Incremental view maintenance for the session table: build on the
    // first ten days, fold in two time-ordered batches via the
    // persistent SessionStore (tail-seeded sessionize, batch-sized
    // work), read the store back. The oracle is the FULL recompute over
    // all events — the incremental path must be indistinguishable from
    // it, including sessions that span a batch boundary.
    Op("rel_sessionize_incremental",
      (s, d) => {
        val dir = s"target/tmp/sessstore_${d.replaceAll("[^A-Za-z0-9]", "_")}"
        graft.api.StoreIO.delete(s, dir)
        val ev = T.events(s, d).select("user_id", "event_id", "ts")
        val c1 = "TIMESTAMP_NTZ '2024-01-11 00:00:00'"
        val c2 = "TIMESTAMP_NTZ '2024-01-21 00:00:00'"
        graft.api.SessionStore.build(ev.where(s"ts < $c1"), dir)
        graft.api.SessionStore.update(ev.where(s"ts >= $c1 AND ts < $c2"), dir, Some("w2"))
        graft.api.SessionStore.update(ev.where(s"ts >= $c2"), dir, Some("w3"))
        graft.api.SessionStore.read(s, dir)
          .withColumn("duration_sec", expr("(end_us - start_us) div 1000000"))
          .select("user_id", "session_seq", "n_events", "start_us", "duration_sec")
          .orderBy("user_id", "session_seq")
      },
      Some(oSessionize),
      doc = "SessionStore incremental maintenance: stored per-user tails " +
        "seed the sessionizer as pseudo-events, so a nightly batch " +
        "extends or opens sessions in batch-proportional work; " +
        "oracle = full recompute."),

    // The 100-TB layout answer for event analytics: bucket events by
    // user_id once at write time and sessionization becomes
    // SHUFFLE-FREE — the bucketed scan's HashPartitioning(user_id)
    // satisfies the window and the (user_id, session_seq) aggregate, so
    // the plan has ZERO hash exchanges (pinned in EventSpec; the only
    // exchange left is the output sort's range partitioning). 8 buckets
    // here; production sizes bucket count to executor fan-out. Same
    // full-recompute oracle as rel_sessionize: layout must not change
    // answers.
    Op("snk_sessionize_bucketed",
      (s, d) => {
        val tbl = s"events_bucketed_${d.replaceAll("[^A-Za-z0-9]", "_")}"
        if (!s.catalog.tableExists(tbl)) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete(): Unit
          }
          val wh = new java.io.File(
            new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, tbl)
          if (wh.exists()) rm(wh)
          T.events(s, d).select("user_id", "event_id", "ts")
            .write.mode("overwrite")
            .bucketBy(8, "user_id").sortBy("user_id", "ts", "event_id")
            .format("parquet").saveAsTable(tbl)
        }
        graft.api.SessionStore.sessionAgg(s.table(tbl))
          .withColumn("duration_sec", expr("(end_us - start_us) div 1000000"))
          .select("user_id", "session_seq", "n_events", "start_us", "duration_sec")
          .orderBy("user_id", "session_seq")
      },
      Some(oSessionize),
      doc = "Sessionization over a user_id-bucketed table: zero hash " +
        "exchanges (bucketed scan partitioning feeds window + aggregate " +
        "directly); the write-once layout that makes event analytics " +
        "shuffle-free at 100 TB."),

    // Strict ordered funnel view -> click -> purchase. Single SQL text
    // on both engines (the asof technique, Relational.scala:125).
    Op("rel_funnel_conversion",
      (s, d) => {
        T.events(s, d).createOrReplaceTempView("events")
        s.sql(funnelSql(spark = true))
      },
      Some(funnelSql(spark = false)),
      doc = "Ordered funnel: first view, first click AFTER it, first " +
        "purchase AFTER that; per-stage user counts + conversion ppm. " +
        "Three shrinking user_id aggregates, 3-row output."),

    // Weekly cohort retention triangle, capped at 4 offsets.
    Op("rel_cohort_retention",
      (s, d) => {
        T.events(s, d).createOrReplaceTempView("events")
        s.sql(cohortSql(spark = true))
      },
      Some(cohortSql(spark = false)),
      doc = "Weekly cohort retention: cohort = week of first event " +
        "(anchored day-count, not ISO weeks), retention_ppm vs the " +
        "cohort's week-0 size via a per-cohort window max."),

    // Top event-type paths: the ordered first-5 event types per session,
    // counted across all sessions. The collect_list is made
    // order-deterministic by sorting on the embedded row number (Spark
    // guarantees no collect order; the struct sort imposes one) — the
    // DuckDB twin is string_agg(... ORDER BY rn).
    Op("rel_event_path",
      (s, d) => {
        val w = Window.partitionBy("user_id", "session_seq").orderBy("us", "event_id")
        sessionEvents(s, d)
          .withColumn("rn", row_number().over(w)).where("rn <= 5")
          .groupBy("user_id", "session_seq")
          .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, event_type))), " +
            "x -> x.event_type), '>')").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_sessions"))
          .orderBy(desc("n_sessions"), col("path")).limit(20)
      },
      Some(s"WITH $oSessions, " +
        "rn AS (SELECT user_id, session_seq, event_type, row_number() OVER " +
        "(PARTITION BY user_id, session_seq ORDER BY us, event_id) AS rn FROM ss), " +
        "p AS (SELECT user_id, session_seq, string_agg(event_type, '>' ORDER BY rn) AS path " +
        "FROM rn WHERE rn <= 5 GROUP BY 1, 2) " +
        "SELECT path, count(*) AS n_sessions FROM p GROUP BY path " +
        "ORDER BY n_sessions DESC, path LIMIT 20"),
      doc = "Top-20 session paths (first 5 event types, '>'-joined): " +
        "session assignment + row_number + sorted collect, all on the " +
        "one user_id exchange; path histogram is a tiny final aggregate.")
  )
}
