package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 13: pins for the round-12 advice findings — NULL-group-key
  * incremental matview maintenance, crash-orphan cleanup in the
  * changefeed relay, constraint validation over an empty staged
  * commit, type-aware ZORDER morton mapping, and clone-time stats
  * carry rules.
  */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String) = s"target/tmp/${tag}_${System.nanoTime()}"

  private def kab(rows: (Long, Long, Long)*) = rows.toDF("k", "a", "b")

  // ---- MatView: NULL group keys -------------------------------------------

  test("matview refresh folds NULL-valued group keys into ONE state row") {
    val d = tmpDir("mv_null")
    val v = tmpDir("mv_null_view")
    // group expr yields NULL for b == 0 rows
    val grp = Seq("g" -> when(col("b") === 0L, lit(null)).otherwise(col("b")))
    api.UpsertStore.update(kab((1L, 10L, 0L), (2L, 20L, 1L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c1"))
    api.MatView.refresh(spark, d, "k", v, grp, Seq("a"))
    // second refresh adds MORE rows into the NULL group: with a
    // null-unsafe join the state would gain a second NULL-group row
    // and the group's count/sum would silently diverge
    api.UpsertStore.update(kab((3L, 30L, 0L), (4L, 40L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c2"))
    api.MatView.refresh(spark, d, "k", v, grp, Seq("a"))
    val st = api.MatView.read(spark, v)
      .select("g", "n_rows", "sum_a")
      .as[(Option[Long], Long, Long)].collect().sortBy(_._1)
    assert(st.toSeq == Seq((None, 3L, 80L), (Some(1L), 1L, 20L)),
      s"NULL group must stay a single, correctly-maintained row; got ${st.toSeq}")
    // and a delete OUT of the NULL group maintains it, not duplicates it
    api.UpsertStore.delete(spark, d, expr("k = 1"), batchId = Some("c3")): Unit
    api.MatView.refresh(spark, d, "k", v, grp, Seq("a"))
    val st2 = api.MatView.read(spark, v)
      .select("g", "n_rows", "sum_a")
      .as[(Option[Long], Long, Long)].collect().sortBy(_._1)
    assert(st2.toSeq == Seq((None, 2L, 70L), (Some(1L), 1L, 20L)))
    api.StoreIO.delete(spark, d)
    api.StoreIO.delete(spark, v)
  }

  // ---- changefeed relay: crash-orphan output partitions -------------------

  test("relay crash between write and cursor cannot double-deliver a window") {
    val d = tmpDir("relay_orphan")
    val cur = s"${tmpDir("relay_orphan_cur")}/cursor.json"
    val out = tmpDir("relay_orphan_out")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c1"))
    assert(streaming.Streams.changefeedRelayOnce(spark, d, "k", cur, out) == 1L)
    api.UpsertStore.update(kab((3L, 3L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c2"))
    // relay the second window, then CRASH before the cursor commit:
    // rewind the cursor to the prior head, leaving to_seq=2 an orphan
    assert(streaming.Streams.changefeedRelayOnce(spark, d, "k", cur, out) == 2L)
    api.UpsertStore.commitCursor(spark, cur, 1L)
    // new commits arrive before redelivery — the failure interleaving:
    // the rerun writes (1, 3] to to_seq=3 while orphan to_seq=2 still
    // holds (1, 2], so commit c2's changes would appear TWICE
    api.UpsertStore.update(kab((4L, 4L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c3"))
    assert(streaming.Streams.changefeedRelayOnce(spark, d, "k", cur, out) == 3L)
    val counts = spark.read.parquet(out).groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
      s"every change must appear exactly once in the consumed output; got $counts")
    Seq(d, out).foreach(api.StoreIO.delete(spark, _))
  }

  // ---- constraints: empty staged output ------------------------------------

  test("CHECK constraints tolerate a bucket-emptying commit (empty stage)") {
    val d = tmpDir("cons_empty")
    api.UpsertStore.update(kab((1L, 5L, 0L), (2L, 7L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("seed"))
    api.UpsertStore.addConstraint(spark, d, "pos", "a > 0")
    // all-tombstone merge batch: every touched bucket empties, the
    // staged dir holds zero data files — validation must pass
    // trivially, not abort on parquet schema inference
    val tomb = Seq((1L, 5L, 0L, "D"), (2L, 7L, 0L, "D")).toDF("k", "a", "b", "op")
    assert(api.UpsertStore.update(tomb, d, "k", "k", nBuckets = 4,
      batchId = Some("t1"), deleteWhere = Some(expr("op = 'D'"))))
    assert(api.UpsertStore.read(spark, d).count() == 0L)
    // and the sweep path: an all-delete full sweep stages empty too
    api.UpsertStore.update(kab((3L, 9L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("reseed"))
    assert(api.UpsertStore.delete(spark, d, lit(true), batchId = Some("wipe")) == 1L)
    assert(api.UpsertStore.read(spark, d).count() == 0L)
    api.StoreIO.delete(spark, d)
  }

  // ---- OPTIMIZE ZORDER: type-aware morton mapping ---------------------------

  test("ZORDER clusters string and date columns; refuses unmappable types") {
    val d = tmpDir("zorder_types")
    val rows = (1L to 40L).map(i =>
      (i, s"cat_${i % 4}", java.sql.Date.valueOf(s"2024-01-${(i % 28 + 1).toString.reverse.padTo(2, '0').reverse}")))
      .toDF("k", "cat", "dt")
    api.UpsertStore.update(rows, d, "k", "k", nBuckets = 2, batchId = Some("seed"))
    // string + date zorder must actually rewrite (a silent all-NULL
    // morton key would still "succeed" — so also pin data intact)
    assert(api.UpsertStore.optimize(spark, d, zorderBy = Seq("cat", "dt")) == 2)
    assert(api.UpsertStore.read(spark, d).count() == 40L)
    assert(api.UpsertStore.read(spark, d).select(sum("k")).as[Long].head() ==
      (1L to 40L).sum)
    val e = intercept[Exception] {
      api.UpsertStore.update(Seq((41L, Seq(1, 2))).toDF("k", "arr"), d, "k", "k",
        nBuckets = 2, batchId = Some("evo"))
      api.UpsertStore.optimize(spark, d, zorderBy = Seq("arr"))
    }
    assert(e.getMessage.contains("no morton mapping"), e.getMessage)
    api.StoreIO.delete(spark, d)
  }

  // ---- object-store-safe commit protocol ------------------------------------

  test("torn generation publish can neither lose the head nor leak into it") {
    val d = tmpDir("torn")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(kab((3L, 3L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c2"))
    // simulate a writer that CRASHED between its publish renames and
    // its commit-log append (on an object store, "rename" is a
    // non-atomic copy+delete, so half-landed publishes are a real
    // state): a fully-materialized generation dir at seq 3 carrying a
    // poison row, in every bucket, with NO commit record behind it
    val f = api.StoreIO.fs(spark, d)
    (0 until 4).foreach { b =>
      Seq((999L + b, 999L, 9L)).toDF("k", "a", "b")
        .coalesce(1).write.parquet(s"$d/b$b/g%012d".format(3L))
    }
    // the committed head is untouched: readers resolve the LOG head,
    // never "newest directory wins" — the orphan rows are invisible
    assert(api.UpsertStore.snapshotSeq(spark, d) == 2L)
    assert(api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(api.UpsertStore.readAsOf(spark, d, 2L).count() == 3L)
    // the next writer claims seq 3 after sweeping the debris — even in
    // buckets its own batch does not touch, where the orphan would
    // otherwise become visible the moment the head advances
    api.UpsertStore.update(kab((4L, 4L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c3"))
    assert(api.UpsertStore.snapshotSeq(spark, d) == 3L)
    assert(api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "orphan generations must be swept, not adopted, by the next commit")
    // no debris above the head remains anywhere
    (0 until 4).foreach { b =>
      val orphan = new org.apache.hadoop.fs.Path(s"$d/b$b/g%012d".format(3L))
      if (f.exists(orphan))
        assert(spark.read.parquet(orphan.toString)
          .where("k >= 999").count() == 0L)
    }
    api.StoreIO.delete(spark, d)
  }

  // ---- clone: stats carry only when the analyzed seq is retained ------------

  test("versionAsOf clone drops stats analyzed after the cloned version") {
    val d = tmpDir("clone_stats")
    api.UpsertStore.update(kab((1L, 5L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(kab((2L, 7L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c2"))
    api.UpsertStore.analyze(spark, d): Unit // analyzed seq = 2
    val past = tmpDir("clone_stats_past")
    api.UpsertStore.cloneStore(spark, d, past, versionAsOf = Some(1L)): Unit
    assert(api.UpsertStore.tableStats(spark, past).isEmpty,
      "a clone of a version predating the ANALYZE must not carry its stats")
    val full = tmpDir("clone_stats_full")
    api.UpsertStore.cloneStore(spark, d, full): Unit
    assert(api.UpsertStore.tableStats(spark, full).map(_._1).contains(2L))
    Seq(d, past, full).foreach(api.StoreIO.delete(spark, _))
  }

  // ---- optimization-round pins (r13): changed operator internals ------------

  test("DistOrder codegen bucketing handles NaN keys exactly like the old HOF") {
    import spark.implicits._
    // NaN sorts greatest in Spark; the old size(filter(b < k)) bucketed
    // NaN into the top bucket (every comparison true). The CASE-chain
    // replacement must keep rank exactness with NaNs present.
    val df = spark.range(0, 500)
      .select(when(col("id") % 50 === 0, lit(Double.NaN))
        .otherwise((col("id") % 23).cast("double")).as("v"), col("id").as("tie"))
    val rk = api.DistOrder.rankCum(df, col("v"),
      Seq(col("v").asc, col("tie").asc), buckets = 6)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").asc, col("tie").asc)
    val truth = df.withColumn("rn_t", row_number().over(w).cast("long"))
    assert(rk.df.join(truth, Seq("v", "tie"))
      .where("rn <> rn_t").count() == 0)
    assert(rk.n == 500L)
  }

  test("Models.dotFp codegen chain is bit-identical to the interpreted fold") {
    // the optimization replaced aggregate(zip_with(w, xq, _*_), 0, _+_)
    // with a left-associated codegen + chain; the IEEE addition order is
    // the same, so every quantized sigmoid must match bit for bit
    val w = Array.tabulate(64)(j => 0.013 * ((j * 7) % 11 + 1) - 0.05)
    val wArr = array(w.map(lit).toIndexedSeq: _*)
    val oldFold = aggregate(
      zip_with(wArr, transform(col("xq"), _.cast("double")), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val oldSigmoid = floor(lit(1.0) /
      (lit(1.0) + exp(-greatest(lit(-30.0), least(lit(30.0), oldFold))))
      * lit(1000000.0) + lit(0.000000001)).cast("long")
    val scored = Tables.t(spark, TestSpark.sf, "embeddings")
      .select(api.Models.xq.as("xq"))
      .withColumn("s_new", api.Models.sigmoidFp(w))
      .withColumn("s_old", oldSigmoid)
    assert(scored.where("s_new <> s_old OR (s_new IS NULL) <> (s_old IS NULL)")
      .count() == 0)
    assert(scored.count() > 0)
  }
}
