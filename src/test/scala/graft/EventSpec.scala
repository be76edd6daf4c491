package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-analytics pins: session-boundary edge cases, strict funnel
  * ordering, cohort offsets, path determinism, and the family's core
  * scale claim — ONE exchange serves sessionization end to end.
  */
class EventSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gap = ops.EventOps.sessionGapUs

  test("assignSessions: strict-gap boundary, ties, and per-user restart") {
    // u1: events at 0, gap (exactly at the gap -> SAME session: break is
    // strictly greater), then gap+gap+1 (break), then same-us tie rows
    // ordered by event_id. u2: single event -> its own session 1.
    val ev = Seq(
      (1L, 10L, "view", 0L),
      (1L, 11L, "click", gap),            // exactly gap after -> same session
      (1L, 12L, "view", 2 * gap + 1),     // gap+1 after -> new session
      (1L, 13L, "click", 2 * gap + 1),    // tie on ts, later event_id
      (2L, 20L, "view", 5L)
    ).toDF("user_id", "event_id", "event_type", "us")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val got = ops.EventOps.assignSessions(ev)
      .select("user_id", "event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 10L)) == 1L && got((1L, 11L)) == 1L)
    assert(got((1L, 12L)) == 2L && got((1L, 13L)) == 2L)
    assert(got((2L, 20L)) == 1L)
  }

  test("funnel counts only ordered stages (purchase before click ≠ conversion)") {
    // u1: view -> click -> purchase (full conversion)
    // u2: purchase, then view, then click: clicks after view count, but
    //     no purchase AFTER the click -> stops at stage 2
    // u3: click only, never views -> not even stage 1
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "view"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "click"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "purchase"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "purchase"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), "view"),
      (6L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), "click"),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click")
    ).map { case (id, ts, et) => (id, ts, (id - 1) / 3 + 1, et) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val rows = spark.sql(ops.EventOps.funnelSql(spark = true))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((1, 2L, 1000000L), (2, 2L, 1000000L), (3, 1L, 500000L)))
  }

  test("cohort offsets anchor on the user's first week; ppm vs week-0 size") {
    // u1 first event in week 0, active again week 2; u2 first in week 1.
    Seq(
      (1L, "2024-01-02", 1L), (2L, "2024-01-16", 1L),
      (3L, "2024-01-09", 2L)
    ).map { case (id, day, u) =>
      (id, java.sql.Timestamp.valueOf(day + " 12:00:00"), u, "view")
    }.toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val got = spark.sql(ops.EventOps.cohortSql(spark = true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 1L, 1000000L), (0L, 2L, 1L, 1000000L),
      (1L, 0L, 1L, 1000000L)))
  }

  test("event paths: order imposed by rn sort, truncated at 5, top-k total order") {
    val dir = TestSpark.sf
    val paths = Registry.byKey("rel_event_path").query(spark, dir).collect()
    assert(paths.nonEmpty && paths.length <= 20)
    // every path has at most 5 steps, all from the 5 known event types
    val types = Set("view", "click", "purchase", "signup", "error")
    paths.foreach { r =>
      val steps = r.getString(0).split(">")
      assert(steps.length <= 5 && steps.forall(types.contains))
    }
    // counts are non-increasing (the ORDER BY n_sessions DESC, path pin)
    val ns = paths.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("sessionize runs on ONE hash exchange: no second shuffle after the user_id hash") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = Registry.byKey("rel_sessionize").query(spark, TestSpark.sf)
    df.count() // materialize the adaptive plan
    def hashEx(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => Seq(e)
        case q: QueryStageExec => hashEx(q.plan)
      }
      here.flatten
    }
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val n = hashEx(plan).size
    assert(n == 1,
      s"window lag + running sum + (user_id, session_seq) agg must all sit on the " +
        s"single user_id exchange; found $n hash exchanges:\n$plan")
  }

  private def evFrame(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("user_id", "event_id", "us")
      .withColumn("ts", expr("CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)"))
      .select("user_id", "event_id", "ts")

  test("SessionStore: a batch event inside the gap MERGES into the stored tail") {
    val dir = s"target/tmp/sess_merge_${System.nanoTime()}"
    val hour = 3600000000L
    // base: u1 two events an hour apart (one session); u2 one event
    api.SessionStore.build(evFrame(Seq((1L, 1L, 0L), (1L, 2L, hour), (2L, 3L, 0L))), dir)
    // batch: u1 event 2h after its tail (merges), then one 9h later (new
    // session); u3 is brand new
    assert(api.SessionStore.update(
      evFrame(Seq((1L, 4L, 3 * hour), (1L, 5L, 12 * hour), (3L, 6L, 0L))), dir, Some("b1")))
    val got = api.SessionStore.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got((1L, 1L)) == ((3L, 0L, 3 * hour)), s"boundary session must merge: $got")
    assert(got((1L, 2L)) == ((1L, 12 * hour, 12 * hour)))
    assert(got((2L, 1L)) == ((1L, 0L, 0L)))
    assert(got((3L, 1L)) == ((1L, 0L, 0L)))
    // replay of the same batch id is a no-op
    assert(!api.SessionStore.update(evFrame(Seq((1L, 4L, 3 * hour))), dir, Some("b1")))
    assert(api.SessionStore.read(spark, dir).count() == 4)
  }

  test("SessionStore generation is atomic: data and ledger survive the crash window together") {
    val dir = s"target/tmp/sess_crash_${System.nanoTime()}"
    val hour = 3600000000L
    api.SessionStore.build(evFrame(Seq((1L, 1L, 0L))), dir)
    assert(api.SessionStore.update(evFrame(Seq((1L, 2L, hour))), dir, Some("b1")))
    // simulate a swap that died between its two renames: the current
    // generation is retired, nothing promoted yet
    val f = api.StoreIO.fs(spark, dir)
    assert(f.rename(new org.apache.hadoop.fs.Path(s"$dir/gen"),
      new org.apache.hadoop.fs.Path(s"$dir/gen-old")))
    // reads fall back to the retired generation...
    assert(api.SessionStore.read(spark, dir).count() == 1)
    // ...and the ledger travels WITH the data: the replay is still a
    // no-op, so the batch can never double-count
    assert(!api.SessionStore.update(evFrame(Seq((1L, 2L, hour))), dir, Some("b1")))
    val r = api.SessionStore.read(spark, dir).head()
    assert(r.getLong(2) == 2L, s"n_events must stay 2 after replay in fallback state: $r")
  }

  test("SessionStore incremental == full recompute on the real events table") {
    val dir = s"target/tmp/sess_full_${System.nanoTime()}"
    val ev = Tables.events(spark, TestSpark.sf).select("user_id", "event_id", "ts")
    api.SessionStore.build(ev.where("ts < TIMESTAMP_NTZ '2024-01-11 00:00:00'"), dir)
    api.SessionStore.update(ev.where(
      "ts >= TIMESTAMP_NTZ '2024-01-11 00:00:00' AND ts < TIMESTAMP_NTZ '2024-01-21 00:00:00'"), dir)
    api.SessionStore.update(ev.where("ts >= TIMESTAMP_NTZ '2024-01-21 00:00:00'"), dir)
    val inc = api.SessionStore.read(spark, dir)
    val full = api.SessionStore.sessionAgg(ev)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental maintenance must be indistinguishable from full recompute")
  }

  test("bucketed sessionize has ZERO hash exchanges: layout replaces the shuffle") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = Registry.byKey("snk_sessionize_bucketed").query(spark, TestSpark.sf)
    df.count()
    def hashEx(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => Seq(e)
        case q: QueryStageExec => hashEx(q.plan)
      }
      here.flatten
    }
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(hashEx(plan).isEmpty,
      s"bucketed scan partitioning must feed window and aggregate directly:\n$plan")
    // and the layout must not change answers
    val viaShuffle = Registry.byKey("rel_sessionize").query(spark, TestSpark.sf)
    assert(df.exceptAll(viaShuffle).isEmpty && viaShuffle.exceptAll(df).isEmpty)
  }

  test("sessionize sessions partition the events: counts add up") {
    val dir = TestSpark.sf
    val sess = Registry.byKey("rel_sessionize").query(spark, dir)
    val total = sess.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, dir).count())
    // durations are non-negative and each session fits the gap contract:
    // n_events=1 sessions have duration 0
    assert(sess.where("duration_sec < 0").count() == 0)
    assert(sess.where("n_events = 1 AND duration_sec <> 0").count() == 0)
  }
}
