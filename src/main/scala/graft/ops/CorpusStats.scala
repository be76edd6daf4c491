package graft.ops

import graft.{Tables => T}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Session-scoped memo of the corpus duplicate-rate statistic the adaptive
  * pair-generators (jaccardPairs, llm_dedup_substring,
  * llm_dedup_levenshtein, llm_dedup_cluster) switch plans on.
  *
  * Each previously ran its own blocking 1-row decision aggregation per
  * invocation; the statistic is a property of the (session, dataset dir)
  * pair, so ONE job now serves every adaptive op in a Verify/Bench run
  * (three corpus scans saved per run). Safety: the statistic only picks
  * between two plans that emit IDENTICAL rows, so a stale entry (a dir
  * mutated mid-session) can affect speed, never results. Keyed on the
  * session instance, so a fresh session re-measures.
  */
object CorpusStats {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (Long, Long)]

  /** Decision-job counter, observable by tests (pins the one-job-per-
    * session-and-dir contract).
    */
  @volatile private[graft] var computes: Long = 0L

  /** (total docs, approx distinct lowered texts) of `dir`'s documents. */
  def dupStats(s: SparkSession, dir: String): (Long, Long) =
    // coarse lock: getOrElseUpdate evaluates the thunk before its CAS,
    // so racing callers would run the decision job twice and could
    // lose counter increments
    cache.synchronized {
      cache.getOrElseUpdate((s, dir), {
        computes += 1
        val r = T.t(s, dir, "documents")
          .agg(count(lit(1)), approx_count_distinct(xxhash64(lower(col("text")))))
          .head()
        (r.getLong(0), r.getLong(1))
      })
    }

  /** True when the corpus is (approximately) duplicate-free: >= ~90%
    * distinct texts — the regime where the exact-dedup-first quotient's
    * text shuffle and member-expansion joins are pure overhead.
    */
  def mostlyUnique(s: SparkSession, dir: String): Boolean = {
    val (n, r) = dupStats(s, dir)
    r > n - n / 10
  }

  /** Scale-invariant rare-term document-frequency cap for the exact
    * near-dup candidate generators (shared-shingle / shared-window):
    * max(256, 1% of corpus docs). An ABSOLUTE cap silently loses
    * near-dup recall as the corpus grows — an ever-larger share of
    * shingles crosses it and drops out of candidate generation — so
    * the cap tracks |docs|. The oracle derives the identical number
    * via [[oRareDfCap]]'s scalar subquery, so engine parity holds at
    * every SF. Reuses the memoized [[dupStats]] job: no extra scan.
    */
  def rareDfCap(s: SparkSession, dir: String): Long =
    math.max(256L, dupStats(s, dir)._1 / 100)

  /** DuckDB expression computing the same cap as [[rareDfCap]]. */
  val oRareDfCap: String = "greatest(256, (SELECT count(*) FROM documents) // 100)"

  private val dfCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), org.apache.spark.sql.DataFrame]

  /** Per-(session, dir, key) builds, observable by tests. */
  private[graft] val dfComputes =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Session-scoped memo for deterministic, ALREADY-MATERIALIZED
    * intermediate DataFrames (the builder must end in localCheckpoint,
    * so the memo hands back settled rows, not a live lineage). Several
    * registry ops share expensive pair-generation pipelines
    * (jaccardPairs feeds llm_ngram_jaccard AND llm_minhash_recall;
    * the verified MinHash pairs feed llm_minhash_verified AND the
    * recall audit) — one build per session serves them all. Safety:
    * the build is a pure function of the (session, dir) corpus, so a
    * hit changes speed, never rows; a fresh session re-builds.
    */
  private[ops] def memoDf(s: SparkSession, dir: String, key: String)(
      build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    dfCache.synchronized {
      dfCache.getOrElseUpdate((s, dir, key), {
        dfComputes.updateWith(key)(c => Some(c.getOrElse(0L) + 1L))
        build
      })
    }
}
