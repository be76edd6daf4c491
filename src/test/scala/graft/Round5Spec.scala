package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: bounded levenshtein blocks, the session-scoped
  * adaptive-decision memo, and the trained ANN index family.
  */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r5fx_").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("levenshtein under the block cap == plain naive all-pairs (no sub key)") {
    // 10 distinct 30-char texts in one (en, 30) block — under the cap, so
    // the semantics are EXACTLY the unbounded blocked join
    val rows = (0L until 10L).map(i => i -> f"near duplicate text nr $i%06d")
    val dir = writeDocs(rows)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val want = docs.as("x").join(docs.as("y"),
        col("x.lang") === col("y.lang") && col("x.n_chars") === col("y.n_chars") &&
          col("x.doc_id") < col("y.doc_id"))
      .withColumn("dist", levenshtein(col("x.text"), col("y.text")))
      .where("dist <= CAST(x.n_chars AS INT) / 5")
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("dist").cast("int").as("dist"))
    val got = Registry.byKey("llm_dedup_levenshtein").query(spark, dir)
      .where("d1 < 900000000") // drop the op's own seeded demo pair
    assert(want.count() == 45L, "all 45 pairs are within tolerance by construction")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("levenshtein over the block cap sub-blocks by the 2-token prefix") {
    // ONE (en, len) block with 40 distinct texts (> cap 32) in two
    // 20-doc prefix groups; every same-prefix pair is within tolerance,
    // every cross-prefix pair must be blocked away
    val rows = (0L until 40L).map { i =>
      val g = i / 20 // prefix group
      i -> f"grp$g%03d grp$g%03d body of document nr $i%06d"
    }
    val dir = writeDocs(rows)
    val got = Registry.byKey("llm_dedup_levenshtein").query(spark, dir)
      .where("d1 < 900000000") // drop the op's own seeded demo pair
    assert(got.count() == 2 * (20 * 19) / 2,
      "exactly the within-prefix-group pairs survive the sub-blocking")
    val crossPrefix = got.where("d1 < 20 AND d2 >= 20")
    assert(crossPrefix.isEmpty, "cross-prefix pairs are blocked by design")
    // and the quotient branch agrees: duplicate every doc 4x so the
    // corpus flips to duplicate-heavy, then member expansion must yield
    // each rep pair 16x plus the 4-copy intra pairs
    val dupRows = rows.flatMap { case (id, t) =>
      (0 until 4).map(c => (id + 1000L * (c + 1)) -> t)
    }
    val dupDir = writeDocs(dupRows)
    val gotDup = Registry.byKey("llm_dedup_levenshtein").query(spark, dupDir)
      .where("d1 < 900000000") // drop the op's own seeded demo pair
    assert(gotDup.count() == 380 * 16 + 40 * 6,
      "quotient expansion: 380 rep pairs x 4x4 members + 40 groups x C(4,2) intra")
    assert(gotDup.where("dist > 0").count() == 380L * 16,
      "inter-group pairs keep the rep distance")
  }

  test("AnnIndex: build/searchIndex round-trip matches the in-memory trained search") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_").toString + "/idx"
    val emb = Tables.t(spark, TestSpark.sf, "embeddings")

    api.AnnIndex.build(emb, dir, k = 10, iters = 3)
    val probes = emb.where("vec_id = 0")
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val viaIndex = api.AnnIndex.searchIndex(spark, dir, probes, k = 5, nProbe = 2)
      .select("p_id", "vec_id", "c_id", "rn")
    val cent = api.AnnIndex.train(emb, 10, 3)
    val inMem = api.AnnIndex.search(api.AnnIndex.assign(emb, cent), cent, probes, 5, 2)
      .select("p_id", "vec_id", "c_id", "rn")
    assert(viaIndex.exceptAll(inMem).isEmpty && inMem.exceptAll(viaIndex).isEmpty,
      "the persisted index must search exactly like the in-memory trained path")
    // and the op goes through the same functions — top-5 ids agree
    val opIds = Registry.byKey("llm_ann_ivf_trained").query(spark, TestSpark.sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex.select("vec_id").collect().map(_.getLong(0)).toSet == opIds)

    // update: fold new vectors in against the FIXED centroids; they are
    // findable afterwards and centroids are untouched
    import spark.implicits._
    val probeRow = emb.where("vec_id = 0").select("embedding").head().getSeq[Float](0)
    val newVecs = Seq((100000L, probeRow, "x"))
      .toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    api.AnnIndex.update(newVecs, dir)
    val after = api.AnnIndex.searchIndex(spark, dir, probes, k = 5, nProbe = 2)
    assert(after.where("vec_id = 100000").count() == 1,
      "an identical-to-probe vector added via update must surface at top rank")
    assert(api.AnnIndex.readCentroids(spark, dir).exceptAll(cent).isEmpty,
      "update never moves centroids")
  }

  test("runIncremental replay overwrites its own run partition instead of duplicating") {
    val base = java.nio.file.Files.createTempDirectory("graft_replay_").toString
    def env = new api.Environment(spark)
      .addNode("src", Nil)(_ => Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "ts", "v"))
    assert(env.runIncremental("src", "ts", s"$base/state", s"$base/out") == 2L)
    // simulate a crash AFTER the data write but BEFORE the run-log
    // commit: wipe the log so the next run replays the same run_seq
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(s"$base/state"))
    assert(env.runIncremental("src", "ts", s"$base/state", s"$base/out") == 2L)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 2, "the replayed run_seq=1 partition replaces itself")
    assert(out.select("id").distinct().count() == 2)
  }

  test("DedupIndex update survives a crash between the swap renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swapfx_").toString + "/idx"
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"))
      .map { case (id, t) => (id, t, "en", "s", t.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    api.DedupIndex.build(docs, dir)
    val before = api.DedupIndex.read(spark, dir).count()
    // simulate the worst crash window: current generation retired to
    // dir-old, promotion of the staged dir never happened
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(s"$dir-old")))
    assert(api.DedupIndex.read(spark, dir).count() == before,
      "read() must fall back to the retired generation")
    // and a subsequent update heals the layout: current exists again
    api.DedupIndex.update(docs, dir)
    assert(new java.io.File(dir).isDirectory)
    assert(api.DedupIndex.read(spark, dir).count() == before)
  }

  test("AnnIndex.searchIndex reads only the probe cells' partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_annprune_").toString + "/idx"
    val emb = Tables.t(spark, TestSpark.sf, "embeddings")
    api.AnnIndex.build(emb, dir, k = 10, iters = 3)
    val probes = emb.where("vec_id = 0")
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val search = api.AnnIndex.searchIndex(spark, dir, probes, k = 5, nProbe = 2)
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(search).toString
    // the assignment scan must carry the cell filter as a PARTITION
    // filter (c_id is the partition column) — the property that makes
    // a stored search a 2-cell read instead of a corpus scan
    assert(plan.contains("PartitionFilters: [c_id#") ||
      plan.matches("(?s).*PartitionFilters: \\[.*c_id.*IN.*\\].*") ||
      plan.matches("(?s).*PartitionFilters: \\[.*c_id.*\\].*"),
      s"expected a c_id partition filter on the assignments scan in:\n${plan.take(3000)}")
  }

  test("round-5 doc ops survive an empty corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r5empty_").toString
    Seq.empty[(Long, String, String, String, Int)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (key <- Seq("llm_cdc_chunk", "llm_dataset_shuffle", "llm_langid_confusion")) {
      assert(Registry.byKey(key).query(spark, dir).count() == 0, key)
    }
  }

  test("CDC chunking edit locality: one edited token perturbs at most 2 chunks per side") {
    // the defining guarantee of content-defined chunking (vs fixed
    // windows, where one edit shifts EVERY later window): an edit can
    // change only the chunk containing it, plus one split/merge at its
    // boundary — so the chunk-fingerprint symmetric difference between
    // original and edited doc is <= 2 on each side. 8 random pairs run
    // through the REAL operator in one fixture.
    val rnd = new scala.util.Random(29)
    val vocab = (0 until 50).map(i => s"w$i")
    val pairs = (0 until 8).map { p =>
      val toks = (0 until (20 + rnd.nextInt(60))).map(_ => vocab(rnd.nextInt(vocab.size)))
      val pos = rnd.nextInt(toks.size)
      val edited = toks.updated(pos, s"edit${p}x")
      (2L * p, toks.mkString(" "), 2L * p + 1, edited.mkString(" "))
    }
    val dir = writeDocs(pairs.flatMap { case (i1, t1, i2, t2) => Seq(i1 -> t1, i2 -> t2) })
    val byDoc = Registry.byKey("llm_cdc_chunk").query(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    pairs.foreach { case (i1, _, i2, _) =>
      val a = byDoc(i1); val b = byDoc(i2)
      def minus(x: Seq[(Int, Long, Long)], y: Seq[(Int, Long, Long)]) =
        y.foldLeft(x) { (acc, e) => acc.diff(Seq(e)) }
      assert(minus(a, b).size <= 2 && minus(b, a).size <= 2,
        s"docs $i1/$i2 differ in one token but ${minus(a, b).size}/${minus(b, a).size} chunks changed")
    }
  }

  test("GraphOps.connectedComponents == union-find reference on random graphs") {
    val rnd = new scala.util.Random(41)
    (1 to 4).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val edges = (0 until (n / 2 + rnd.nextInt(n)))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val isolated = (n.toLong until n + 3L) // extra nodes with no edges
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      (edges.flatMap { case (a, b) => Seq(a, b) } ++ isolated).foreach(find)
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      // min-label invariant: the reference root IS the component min
      val minOf = want.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
      val wantMin = want.map { case (x, r) => x -> minOf(r) }

      val got = ops.GraphOps.connectedComponents(
          edges.toDF("d1", "d2"), Seq(isolated.toDF("d1")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == wantMin)
    }
  }

  test("GraphOps.pagerankFp == sequential integer replay on a fixture graph") {
    import spark.implicits._
    // path 1-2-3, triangle 10-11-12, bridge 3-10: mixed degrees 1..3
    val edgeList = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val pairs = edgeList.toDF("d1", "d2")
    val got = ops.GraphOps.pagerankFp(pairs, iters = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val sym = edgeList ++ edgeList.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).map { case (u, es) => u -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val contrib = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) * 85 / (100 * deg(u)) }.sum
      }
      r = contrib.map { case (v, c) => v -> (150000L + c) }
    }
    assert(got.keySet == r.keySet)
    r.foreach { case (id, rv) =>
      assert(got(id) == ((rv, deg(id))), s"node $id: got ${got(id)}, want ($rv, ${deg(id)})")
    }
    // integer rank mass stays bounded by the initial mass
    assert(r.values.sum <= 1000000L * r.size)
  }

  test("adaptive decision aggregation runs once per (session, dir)") {
    val dir = writeDocs((0L until 50L).map(i => i -> s"wholly unique text number $i"))
    val before = ops.CorpusStats.computes
    // three adaptive ops over the same dir: one decision job total
    Registry.byKey("llm_ngram_jaccard").query(spark, dir).count()
    Registry.byKey("llm_dedup_substring").query(spark, dir).count()
    Registry.byKey("llm_dedup_levenshtein").query(spark, dir).count()
    assert(ops.CorpusStats.computes == before + 1,
      "the dup-rate statistic must be memoized across adaptive ops")
  }
}
