package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** The cost-based-optimizer wiring: graft.api.Stats one-scan column
  * statistics installed into the session catalog must actually CHANGE
  * plans — the round-4 verdict's "make the 200th operator load-bearing
  * instead of decorative".
  */
class CboSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def collectJoins(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case j: BroadcastHashJoinExec => j
    case j: SortMergeJoinExec => j
  }

  test("one-scan catalog stats flip a selective-filter join from shuffle to broadcast") {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan under test
      // below both sides' column-pruned file-size estimates, so nothing
      // broadcasts without stats — only a stats-estimated selective filter can
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (2 * 1024).toString)

      // sf0.01: orders 278 KB / customer 33 KB on disk; even column-pruned,
      // both sides estimate well above the 2 KB threshold without stats
      val dir = "/root/testdata/sf0.01"
      spark.sql("DROP TABLE IF EXISTS orders_cbo")
      spark.sql("DROP TABLE IF EXISTS customer_cbo")
      api.Stats.registerParquetTable(spark, "orders_cbo", s"$dir/orders.parquet")
      api.Stats.registerParquetTable(spark, "customer_cbo", s"$dir/customer.parquet")

      val q = "SELECT c.c_name, o.o_totalprice FROM orders_cbo o " +
        "JOIN customer_cbo c ON o.o_custkey = c.c_custkey " +
        "WHERE o.o_orderkey <= 20" // ~0.1% of [0, 14999] once min/max are known
      def planOf() = GraftSqlBridge.executedPlan(spark.sql(q))

      val beforeJoins = collectJoins(planOf())
      assert(beforeJoins.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"without stats both sides estimate at file size -> shuffle join; got $beforeJoins")

      // the one-scan ANALYZE — same job as core_column_stats
      val st = api.Stats.analyze(spark, "orders_cbo")
      api.Stats.analyze(spark, "customer_cbo")
      assert(st.rowCount.exists(_ > 0) && st.colStats.contains("o_orderkey"))
      assert(GraftSqlBridge.tableStats(spark, "orders_cbo")
        .exists(_.colStats("o_orderkey").distinctCount.exists(_ > 0)))

      val afterJoins = collectJoins(planOf())
      assert(afterJoins.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"with min/max+NDV the <=20 filter estimate drops below the " +
          s"broadcast threshold and the join side flips; got $afterJoins")

      // and the result is identical either way — stats steer, never change
      val direct = Tables.t(spark, dir, "orders").where("o_orderkey <= 20")
        .join(Tables.t(spark, dir, "customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
        .count()
      assert(spark.sql(q).count() == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_cbo")
      spark.sql("DROP TABLE IF EXISTS customer_cbo")
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("catalog stats drive join reorder: the selective dimension joins first") {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled", "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pure SMJ tree
      val dir = "/root/testdata/sf0.01"
      for (t <- Seq("lineitem_cbo" -> "lineitem", "orders_cbo2" -> "orders",
          "customer_cbo2" -> "customer")) {
        spark.sql(s"DROP TABLE IF EXISTS ${t._1}")
        api.Stats.registerParquetTable(spark, t._1, s"$dir/${t._2}.parquet")
      }
      // written in the WORST order: the two big facts join first, the
      // tiny filtered dimension last
      val q = "SELECT count(*) AS n FROM lineitem_cbo l " +
        "JOIN orders_cbo2 o ON l.l_orderkey = o.o_orderkey " +
        "JOIN customer_cbo2 c ON o.o_custkey = c.c_custkey " +
        "WHERE c.c_custkey <= 15"
      def bottomJoinTables(): Set[String] = {
        val plan = GraftSqlBridge.executedPlan(spark.sql(q))
        // innermost join = the one whose children contain no other join
        val joins = plan.collect { case j: SortMergeJoinExec => j }
        val inner = joins.filter(j => collectJoins(j.left).isEmpty && collectJoins(j.right).isEmpty)
        inner.flatMap(_.collectLeaves().map(_.toString)).flatMap { s =>
          Seq("lineitem_cbo", "orders_cbo2", "customer_cbo2").filter(s.contains)
        }.toSet
      }
      assert(bottomJoinTables() == Set("lineitem_cbo", "orders_cbo2"),
        "without stats the syntactic order stands: facts join first")
      Seq("lineitem_cbo", "orders_cbo2", "customer_cbo2")
        .foreach(api.Stats.analyze(spark, _))
      assert(bottomJoinTables() == Set("orders_cbo2", "customer_cbo2"),
        "with row counts + NDV the reorderer joins the filtered dimension first")
    } finally {
      Seq("lineitem_cbo", "orders_cbo2", "customer_cbo2")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("equi-height histogram stats flip a skewed range-predicate join to broadcast") {
    import spark.implicits._
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val before = keys.map(k => k -> spark.conf.getOption(k)).toMap
    val tmp = java.nio.file.Files.createTempDirectory("graft_hist_cbo_").toString
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (32 * 1024).toString)

      // skewed fact: 40k rows clustered in [0, 100), 400 outliers in
      // [500k, 900k). The uniform (min/max) assumption puts `v >= 5000`
      // at ~99.5% selectivity; the truth is ~1%.
      (0L until 40400L).map(id =>
          (id % 5000L, if (id < 40000L) id % 100L else 500000L + (id - 40000L) * 1000L))
        .toDF("k", "v")
        .write.mode("overwrite").parquet(s"$tmp/fact")
      (0L until 5000L).map(id => (id, "p" * 40)).toDF("k", "pad")
        .write.mode("overwrite").parquet(s"$tmp/dim")
      spark.sql("DROP TABLE IF EXISTS hist_fact_cbo")
      spark.sql("DROP TABLE IF EXISTS hist_dim_cbo")
      api.Stats.registerParquetTable(spark, "hist_fact_cbo", s"$tmp/fact")
      api.Stats.registerParquetTable(spark, "hist_dim_cbo", s"$tmp/dim")

      val q = "SELECT f.k, f.v, d.pad FROM hist_fact_cbo f " +
        "JOIN hist_dim_cbo d ON f.k = d.k WHERE f.v >= 5000"
      def planOf() = GraftSqlBridge.executedPlan(spark.sql(q))
      def filterEstimate(): BigInt = GraftSqlBridge
        .planStats(spark.sql("SELECT * FROM hist_fact_cbo WHERE v >= 5000"))
        .rowCount.getOrElse(sys.error("cbo must estimate a row count"))

      // basic stats (min/max/NDV, NO histogram): the uniform assumption
      // keeps the filtered fact big -> both sides above threshold -> SMJ
      api.Stats.analyze(spark, "hist_fact_cbo")
      api.Stats.analyze(spark, "hist_dim_cbo")
      val uniformEst = filterEstimate()
      assert(uniformEst > BigInt(30000),
        s"uniform assumption must overestimate the skewed range: $uniformEst")
      assert(collectJoins(planOf()).exists(_.isInstanceOf[SortMergeJoinExec]),
        "without a histogram the overestimated filter keeps the shuffle join")

      // re-analyze the fact WITH the histogram: selectivity becomes
      // visible, the filtered side drops under the threshold, broadcast
      api.Stats.analyze(spark, "hist_fact_cbo", histogramCols = Seq("v"))
      val histEst = filterEstimate()
      assert(histEst < BigInt(2000),
        s"histogram must expose the ~1% true selectivity: $histEst")
      assert(collectJoins(planOf()).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "the histogram-driven estimate must flip the join to broadcast")

      // stats steer, never change results
      assert(spark.sql(q).count() ==
        spark.read.parquet(s"$tmp/fact").where("v >= 5000")
          .join(spark.read.parquet(s"$tmp/dim"), "k").count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS hist_fact_cbo")
      spark.sql("DROP TABLE IF EXISTS hist_dim_cbo")
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("columnStats one-scan frame matches direct per-column aggregates") {
    val df = Tables.t(spark, TestSpark.sf, "orders")
    val got = api.Stats.columnStats(df, Seq("o_custkey", "o_orderstatus"))
      .orderBy("column").collect()
    val n = df.count()
    val custNdv = df.select("o_custkey").distinct().count()
    val statusNdv = df.select("o_orderstatus").distinct().count()
    assert(got.map(_.getAs[String]("column")).toSeq == Seq("o_custkey", "o_orderstatus"))
    assert(got.forall(_.getAs[Long]("n_rows") == n))
    // default NDV is the HLL++ sketch (rsd 0.05): within 15% of exact
    assert(math.abs(got(0).getAs[Long]("ndv") - custNdv) <= custNdv * 0.15)
    assert(math.abs(got(1).getAs[Long]("ndv") - statusNdv) <= statusNdv * 0.15)
    assert(got(0).getAs[Long]("n_nonnull") == n)
    // the exact opt-in still returns exact counts
    val exact = api.Stats.columnStats(df, Seq("o_custkey", "o_orderstatus"),
      exactNdv = true).orderBy("column").collect()
    assert(exact(0).getAs[Long]("ndv") == custNdv)
    assert(exact(1).getAs[Long]("ndv") == statusNdv)
  }

  test("exact-NDV arm equals a driver-side independent recompute (oracle teeth)") {
    // The ANALYZE ops ship `ndv_within_bounds` (sketch within 15% of the
    // exact arm), so the DuckDB oracle no longer constrains NDV itself.
    // Pin the exact arm against ground truth computed OUTSIDE the
    // aggregate path under test — collected raw values, deduped on the
    // driver — including a NULL-carrying column (count(DISTINCT)
    // ignores NULLs; the ground truth must too).
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "a"), (2L, "b"), (3L, null), (null, "b"), (null, null))
      .toDF("k", "v")
    val got = api.Stats.columnStats(df, Seq("k", "v"), exactNdv = true)
      .orderBy("column").collect()
    val kTruth = df.select("k").collect().map(r => Option(r.get(0)))
      .flatten.toSet.size.toLong
    val vTruth = df.select("v").collect().map(r => Option(r.get(0)))
      .flatten.toSet.size.toLong
    assert(got(0).getAs[Long]("ndv") == kTruth, s"k ndv: ${got(0)} vs $kTruth")
    assert(got(1).getAs[Long]("ndv") == vTruth, s"v ndv: ${got(1)} vs $vTruth")
    // and the sketch arm stays inside the 15% bound the ops assert on —
    // the ndv_within_bounds boolean cannot silently degrade while this
    // holds on the same data shape
    val sk = api.Stats.columnStats(df, Seq("k", "v")).orderBy("column").collect()
    assert(math.abs(sk(0).getAs[Long]("ndv") - kTruth) <= math.ceil(kTruth * 0.15))
    assert(math.abs(sk(1).getAs[Long]("ndv") - vTruth) <= math.ceil(vTruth * 0.15))
  }

  test("columnStats default plan carries NO Expand (sketch NDV shares one pass)") {
    val df = Tables.t(spark, TestSpark.sf, "orders")
    // multi-column: the exact path would Expand-replicate the input
    // once per distinct column; the sketch default must not. Pinned on
    // the OPTIMIZED LOGICAL plan (RewriteDistinctAggregates inserts
    // Expand there) — the physical plan hides inside AQE's wrapper.
    val plan = GraftSqlBridge.optimizedPlan(api.Stats.columnStats(df,
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice")))
    assert(plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.isEmpty, s"sketch-NDV columnStats must not Expand the input:\n$plan")
    // the exact opt-in is now one single-distinct branch per column
    // (a lone count(DISTINCT) never Expands) — pinned Expand-free too
    val exactPlan = GraftSqlBridge.optimizedPlan(api.Stats.columnStats(df,
      Seq("o_custkey", "o_orderstatus", "o_orderpriority"), exactNdv = true))
    assert(exactPlan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }.isEmpty, s"exact-NDV columnStats must not Expand either:\n$exactPlan")
  }
}
