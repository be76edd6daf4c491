package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-E — snapflow's incremental/stream semantics as
  * batch-equivalent DataFrame queries (the t2 oracle cannot run streams).
  * The true Structured Streaming forms live in graft.streaming and are
  * pinned equal to these in the test suite.
  */
object StreamingOps {

  /** The sessionization window-trick on any (user_id, ts, event_id) frame.
    * A row at exactly prev_ts + gap still JOINS the session (strictly
    * greater starts a new one) — Spark's session_window merges windows
    * that touch at the boundary; pinned equal by a property test.
    */
  def sessionizeBatch(events: org.apache.spark.sql.DataFrame, gap: String = "30 MINUTE"): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull || expr(s"ts > prev_ts + INTERVAL $gap"), 1).otherwise(0))
      .withColumn("session_id", sum("new_s").over(cum))
  }

  val ops: Seq[Op] = Seq(

    Op("strm_tumbling_window",
      (s, d) => T.events(s, d)
        .groupBy(expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("bucket"))
        .agg(count(lit(1)).as("n_events"), T.dsum(col("value")).as("sum_value"))
        .orderBy("bucket"),
      Some("SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events, " +
        s"${T.oSum("value")} AS sum_value " +
        "FROM events GROUP BY date_trunc('hour', ts) ORDER BY bucket")),

    // 1-hour window sliding every 15 min: each event lands in exactly 4
    // windows (batch equivalent of window(ts, '1 hour', '15 minutes')).
    Op("strm_sliding_window",
      (s, d) => T.events(s, d)
        .select(col("ts"), col("value"), explode(expr("array(0, 1, 2, 3)")).as("k"))
        .withColumn("w_start", expr(
          "CAST(date_trunc('hour', ts) + make_interval(0, 0, 0, 0, 0, (minute(ts) div 15) * 15 - k * 15, 0) AS TIMESTAMP_NTZ)"))
        .groupBy("w_start")
        .agg(count(lit(1)).as("n_events"), T.dsum(col("value")).as("sum_value"))
        .withColumn("w_end", expr("w_start + INTERVAL 1 HOUR"))
        .orderBy("w_start"),
      Some("SELECT w_start, count(*) AS n_events, " +
        s"${T.oSum("value")} AS sum_value, " +
        "w_start + INTERVAL 1 HOUR AS w_end FROM (" +
        "SELECT date_trunc('hour', ts) + ((minute(ts) // 15) * 15 - k.k * 15) * INTERVAL 1 MINUTE AS w_start, value " +
        "FROM events, (VALUES (0), (1), (2), (3)) k(k)) " +
        "GROUP BY w_start ORDER BY w_start")),

    // sessionization with a 30-minute gap: lag + cumulative-sum-of-flags
    // window trick (same event at exactly lag+30min starts a new session,
    // matching session_window's half-open [start, last+gap) semantics).
    Op("strm_session_window",
      (s, d) => {
        sessionizeBatch(T.events(s, d))
          .groupBy("user_id", "session_id")
          .agg(
            min("ts").as("session_start"), max("ts").as("session_end"),
            count(lit(1)).as("n_events"), T.dsum(col("value")).as("sum_value"))
          .orderBy("user_id", "session_start")
      },
      Some("SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end, " +
        s"count(*) AS n_events, ${T.oSum("value")} AS sum_value FROM (" +
        "SELECT user_id, ts, event_id, value, " +
        "CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (" +
        "SELECT user_id, ts, event_id, value, " +
        "CASE WHEN lag(ts) OVER w IS NULL OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE " +
        "THEN 1 ELSE 0 END AS new_s FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))) " +
        "GROUP BY user_id, session_id ORDER BY user_id, session_start")),

    // watermark: keep only events within 24h of the observed max event time
    // (batch analogue of withWatermark + late-row drop).
    Op("strm_watermark_late",
      (s, d) => {
        val e = T.events(s, d)
        val wm = e.agg(max("ts").as("max_ts"))
        e.crossJoin(broadcast(wm))
          .where(expr("ts >= max_ts - INTERVAL 24 HOUR"))
          .select("event_id", "user_id", "ts", "event_type")
          .orderBy("event_id")
      },
      Some("SELECT event_id, user_id, ts, event_type FROM events " +
        "WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOUR " +
        "ORDER BY event_id")),

    // streaming dedupe: first-seen row per (user_id, event_type) with a
    // deterministic order, not bare dropDuplicates (§2-E).
    Op("strm_dedup_stateful",
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
        T.events(s, d)
          .withColumn("rn", row_number().over(w)).where("rn = 1")
          .select("user_id", "event_type", "event_id", "ts")
          .orderBy("user_id", "event_type")
      },
      Some("SELECT user_id, event_type, event_id, ts FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id, event_type")),

    // incremental node state: process only blocks past the stored
    // high-watermark (snapflow's DataBlockLog consumption accounting).
    Op("strm_incremental_state",
      (s, d) => T.events(s, d)
        .where(expr("ts > TIMESTAMP_NTZ '2024-01-15 00:00:00'"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_new"), max("ts").as("latest_ts"))
        .orderBy("event_type"),
      Some("SELECT event_type, count(*) AS n_new, max(ts) AS latest_ts FROM events " +
        "WHERE ts > TIMESTAMP '2024-01-15 00:00:00' " +
        "GROUP BY event_type ORDER BY event_type")),

    // stream-stream interval join (view -> purchase attribution within
    // 1 hour, per user). Batch equivalent of the watermarked streaming
    // join in graft.streaming.Streams.clickPurchaseJoin, which is
    // parity-pinned to this in the test suite. Equi key (user_id) plus a
    // range residual — Spark plans a hash/merge join on user_id, never a
    // nested loop; in streaming both sides carry watermarks so state for
    // expired intervals is dropped.
    Op("strm_interval_join",
      (s, d) => {
        val ev = T.events(s, d)
        val views = ev.where("event_type = 'view'")
          .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
        val buys = ev.where("event_type = 'purchase'")
          .select(col("user_id"), col("event_id").as("buy_id"),
            col("ts").as("buy_ts"), col("value"))
        views.join(buys, Seq("user_id"))
          .where("buy_ts >= view_ts AND buy_ts <= view_ts + INTERVAL 1 HOUR")
          .select("user_id", "view_id", "buy_id", "view_ts", "buy_ts", "value")
          .orderBy("user_id", "view_id", "buy_id")
      },
      Some("SELECT v.user_id, v.event_id AS view_id, b.event_id AS buy_id, " +
        "v.ts AS view_ts, b.ts AS buy_ts, b.value " +
        "FROM (SELECT * FROM events WHERE event_type = 'view') v " +
        "JOIN (SELECT * FROM events WHERE event_type = 'purchase') b " +
        "ON v.user_id = b.user_id AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 1 HOUR " +
        "ORDER BY v.user_id, view_id, buy_id")),

    // stream-static join: the purchase stream enriched with the customer
    // dimension (batch equivalent of Streams.enrichPurchases, parity-
    // pinned in the test suite). The dim side broadcasts — the stream
    // never shuffles, which is the only shape that works when the stream
    // is unbounded and the dim is a bounded snapshot.
    Op("strm_join_stream_static",
      (s, d) => {
        val buys = T.events(s, d).where("event_type = 'purchase'")
        graft.streaming.Streams.enrichPurchases(buys, T.t(s, d, "customer"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_buys"), T.dsum(col("value")).as("sum_value"))
          .orderBy("c_mktsegment")
      },
      Some("SELECT c_mktsegment, count(*) AS n_buys, " +
        s"${T.oSum("value")} AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "WHERE event_type = 'purchase' " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment")),
  )
}
