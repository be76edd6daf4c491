package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 additions: targeted semantic pins for the new operators plus
  * the pointer-doubling convergence guarantee on a long near-dup chain.
  */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A path-graph corpus: doc i = 30 consecutive tokens of a unique-token
    * stream, stepping 11 tokens — consecutive docs share trigram-Jaccard
    * ~0.44 (near-dups), two steps apart ~0.12 (not). 25 docs ⇒ component
    * diameter 24, beyond the old 16-round propagation cap; pointer
    * doubling must still converge it into ONE cluster labeled by the
    * minimum doc_id.
    */
  private lazy val chainDir: String = {
    val dir = "target/tmp/sfchain"
    val stream = (0 until 294).map(i => f"w$i%03d")
    val docs = (0 until 25).map { i =>
      val text = stream.slice(i * 11, i * 11 + 30).mkString(" ")
      (i.toLong + 1, text, "en", "src0", text.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("llm_dedup_cluster converges past the old 16-round cap on a diameter-24 chain") {
    val out = Registry.byKey("llm_dedup_cluster").query(spark, chainDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 25, s"expected every chain doc clustered, got ${out.size}")
    assert(out.values.toSet == Set(1L), s"expected one cluster labeled 1, got ${out.values.toSet}")
  }

  test("null-safe join matches NULL keys to each other, plain join drops them") {
    val l = Seq((1, Some(10)), (2, None)).toDF("id", "k")
    val r = Seq((3, Some(10)), (4, None)).toDF("rid", "rk")
    val safe = l.join(r, col("k") <=> col("rk")).select("id", "rid").as[(Int, Int)].collect().toSet
    assert(safe == Set((1, 3), (2, 4)))
    val plain = l.join(r, col("k") === col("rk")).select("id", "rid").as[(Int, Int)].collect().toSet
    assert(plain == Set((1, 3)))
  }

  test("bpe merge step: counts merges of the top pair, left to right") {
    val dir = "target/tmp/sfbpe"
    val docs = Seq(
      (1L, "a b a b c", "en", "src0", 9L),   // 'a b' twice
      (2L, "a b x y z", "en", "src0", 9L),   // once
      (3L, "q r s t u", "en", "src0", 9L))   // none
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byKey("llm_bpe_merge_step").query(spark, dir)
      .select("doc_id", "top_pair", "n_merges").as[(Long, String, Int)].collect().toSet
    // pair counts: 'a b'=3? no — doc1 has pairs (a b),(b a),(a b),(b c): 'a b' ×2;
    // doc2 adds one more 'a b' → 3 total, the clear top pair.
    assert(out == Set((1L, "a b", 2), (2L, "a b", 1), (3L, "a b", 0)))
  }

  test("token entropy: 0 for constant docs, ln(n) for all-distinct docs") {
    val dir = "target/tmp/sfent"
    val docs = Seq(
      (1L, "x x x x x x x x", "en", "src0", 15L),
      (2L, "a b c d e f g h", "en", "src0", 15L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.byKey("llm_token_entropy").query(spark, dir)
      .select("doc_id", "entropy").as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L)) < 1e-5, s"constant doc entropy ${out(1L)}")
    assert(math.abs(out(2L) - math.log(8)) < 1e-5, s"distinct doc entropy ${out(2L)}")
  }

  test("zipf fit slope is near -1 on an exactly zipfian corpus") {
    val dir = "target/tmp/sfzipf"
    // token t_k appears floor(120/k) times: freq ∝ 1/rank
    val text = (1 to 12).flatMap(k => Seq.fill(120 / k)(f"t$k%02d")).mkString(" ")
    Seq((1L, text, "en", "src0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val slope = Registry.byKey("llm_zipf_fit").query(spark, dir)
      .select("zipf_slope").as[Double].head()
    assert(slope < -0.8 && slope > -1.2, s"slope $slope not ~ -1")
  }

  test("running totals are cumulative per key and exact") {
    val dir = TestSpark.sf
    val out = Registry.byKey("strm_running_totals").query(spark, dir)
    // last row per event_type must equal the plain group totals
    val last = out.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(desc("run_cnt"))))
      .where("rn = 1").select("event_type", "run_cnt").as[(String, Long)].collect().toMap
    val totals = Tables.events(spark, dir).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(last == totals)
  }
}
