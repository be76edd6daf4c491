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
    assert(gotDup.count() == 380 * 16 + 40 * 6,
      "quotient expansion: 380 rep pairs x 4x4 members + 40 groups x C(4,2) intra")
    assert(gotDup.where("dist > 0").count() == 380L * 16,
      "inter-group pairs keep the rep distance")
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
