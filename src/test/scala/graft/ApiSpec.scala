package graft

import graft.api.{Environment, RecordSchema}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class ApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Environment: declared graph produces and orders nodes") {
    val env = new Environment(spark)
      .addParquetSource("orders", s"${TestSpark.sf}/orders.parquet")
      .addParquetSource("customer", s"${TestSpark.sf}/customer.parquet")
      .addNode1("open_orders", "orders")(_.where("o_orderstatus = 'O'"))
      .addNode("enriched", Seq("open_orders", "customer"))(dfs =>
        dfs(0).join(dfs(1), dfs(0)("o_custkey") === dfs(1)("c_custkey")))
    assert(env.executionOrder("enriched") == Seq("orders", "open_orders", "customer", "enriched"))
    val n = env.produce("enriched").count()
    assert(n > 0)
    val direct = Tables.t(spark, TestSpark.sf, "orders").where("o_orderstatus = 'O'")
      .join(Tables.t(spark, TestSpark.sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(n == direct)
  }

  test("RecordSchema: conform casts, soft-casts, and fills missing") {
    val schema = RecordSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("amount", DoubleType),
      StructField("note", StringType))), uniqueOn = Seq("id"))
    val raw = Seq(("1", "2.5"), ("2", "oops")).toDF("id", "amount")
    val strict = schema.conform(raw)
    assert(strict.schema.map(f => (f.name, f.dataType)) ==
      Seq(("id", LongType), ("amount", DoubleType), ("note", StringType)))
    val soft = schema.conform(raw, soft = true).collect()
    assert(soft.length == 2 && soft.forall(_.isNullAt(2)))
    assert(soft.find(_.getLong(0) == 2L).exists(_.isNullAt(1))) // 'oops' -> NULL
  }

  test("RecordSchema: translate, dedupe on unique_on, violations") {
    val schema = RecordSchema(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", IntegerType))), uniqueOn = Seq("id"))
    val realized = Seq((1L, 10, 1), (1L, 20, 2), (2L, 5, 1)).toDF("key", "value", "ver")
    val translated = schema.translateFrom(
      realized.withColumnRenamed("ver", "order_col"),
      Map("key" -> "id", "value" -> "v"))
    assert(translated.columns.toSeq == Seq("id", "v"))
    val deduped = schema.dedupeKeepLatest(
      realized.select(col("key").as("id"), col("value").as("v"), col("ver")), "ver")
    assert(deduped.select("id", "v").as[(Long, Int)].collect().toSet == Set((1L, 20), (2L, 5)))
    val bad = schema.violations(realized.select(col("key").as("id"), col("value").as("v")))
    assert(bad.count() == 2) // the duplicate id=1 pair
  }

  test("RecordSchema: diff reports missing, undeclared, and type-changed columns") {
    import org.apache.spark.sql.types._
    val schema = graft.api.RecordSchema(StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType))))
    val realized = Seq((1, "a", "x")).toDF("id", "name", "extra")
    val drifts = schema.diff(realized)
    assert(drifts.map(d => (d.column, d.kind)) == Seq(
      ("extra", "undeclared"), ("id", "type_changed"), ("price", "missing")))
    assert(schema.diff(Seq((1L, "a", 2.0)).toDF("id", "name", "price")).isEmpty)
  }

  test("CoreModule: accumulate/merge/latest/sinceWatermark") {
    import graft.api.CoreModule
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val b = Seq((3L, 9.5)).toDF("id", "w")
    val acc = CoreModule.accumulate(Seq(a, b))
    assert(acc.count() == 3 && acc.columns.toSet == Set("id", "v", "w"))

    val ev = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ver", "event_id")
    val lat = CoreModule.latest(ev, Seq("user_id"), "ver", "event_id")
      .select("user_id", "ver").as[(Long, Long)].collect().toSet
    assert(lat == Set((1L, 20L), (2L, 5L)))

    val evts = Tables.events(spark, TestSpark.sf)
    val wm = java.time.LocalDateTime.of(2024, 1, 15, 0, 0)
    val recent = CoreModule.sinceWatermark(evts, "ts", wm)
    assert(recent.agg(min("ts")).head.getAs[java.time.LocalDateTime](0).isAfter(wm))

    // conform the raw events frame against the module's declared schema
    val conformed = CoreModule.EventSchema.conform(evts)
    assert(conformed.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
  }

  test("saltedJoin equals the plain join") {
    val rnd = new scala.util.Random(11)
    // skewed: 80% of rows share key 0
    val large = (1 to 500).map(i => (if (rnd.nextInt(5) > 0) 0L else rnd.nextInt(20).toLong, i))
      .toDF("k", "v")
    val small = (0 to 19).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")
    val fast = graft.ops.Joins.saltedJoin(large, small, "k")
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
    val plain = large.join(small, "k")
      .select("k", "v", "name").as[(Long, Int, String)].collect().sorted.toSeq
    assert(fast == plain)
  }

  test("bucketed join reads buckets without shuffling the bucketed side") {
    val df = Registry.byKey("snk_bucketed_join").query(spark, TestSpark.sf)
    assert(df.count() == 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"), s"expected bucketed scan in:\n${plan.take(2000)}")
  }

  test("runIncremental processes exactly the unconsumed rows per run") {
    val base = s"target/tmp/incr_env_${System.nanoTime()}"
    var rows = Seq((1L, 10L, "a"), (2L, 20L, "b"))
    val env = new graft.api.Environment(spark)
      .addNode("src", Nil)(_ => rows.toDF("id", "ts", "v"))

    assert(env.runIncremental("src", "ts", s"$base/state", s"$base/out") == 2L)
    // nothing new: no rows processed, nothing appended
    assert(env.runIncremental("src", "ts", s"$base/state", s"$base/out") == 0L)
    rows = rows ++ Seq((3L, 30L, "c"))
    assert(env.runIncremental("src", "ts", s"$base/state", s"$base/out") == 1L)

    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 3)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("scalable as-of join equals the window-emulation on random data") {
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 120).map(i => (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(1000)))
      .toDF("k", "lid", "lts")
    val rights = (1 to 80).map(i => (rnd.nextInt(5).toLong, 1000L + i, rnd.nextInt(1000)))
      .toDF("k", "rid", "rts")

    val fast = graft.ops.Joins.asofJoin(lefts, rights, "k", "lts", "rts",
        payload = Seq("rid"), tiebreak = "rid")
      .select(col("k"), col("lid"), col("__match.rid").as("rid"))
      .as[(Long, Long, Option[Long])].collect().toSet

    val w = Window.partitionBy("lid").orderBy(desc_nulls_last("rts"), desc_nulls_last("rid"))
    val slow = lefts.join(rights.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("rts") <= col("lts"), "left")
      .withColumn("rn", row_number().over(w)).where("rn = 1")
      .select(col("k"), col("lid"), col("rid"))
      .as[(Long, Long, Option[Long])].collect().toSet

    assert(fast == slow)
  }

  test("Sessions.local applies the scale-critical knobs and runs a query") {
    // getOrCreate on the shared context applies the builder's session
    // confs to the SHARED session — snapshot and restore them so this
    // test can't leak plan-shaping state (broadcast threshold, codec)
    // into concurrently scheduled suites
    val keys = Seq("spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.shuffle.partitions", "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.parquet.compression.codec", "spark.sql.session.timeZone",
      "spark.sql.files.maxPartitionBytes", "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val before = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      val s = api.Sessions.local("t-local").getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "4")
      assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") == (64L * 1024 * 1024).toString)
      assert(s.conf.get("spark.sql.parquet.compression.codec") == "zstd")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      import s.implicits._
      assert(Seq(1, 2, 3).toDS().reduce(_ + _) == 6)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
