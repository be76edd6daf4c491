package graft

import graft.functions.{CosineSimilarity, MinHashSig, ShingleHashes, SimHash32}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: registers the engine's native
  * expressions so any session started with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `.withExtensions(new GraftExtensions)`) can use `cosine_sim`,
  * `shingle_hashes`, `minhash_sig`, `simhash32` from SQL directly —
  * the idiomatic deployment path on a shared cluster, where per-session
  * createOrReplaceTempFunction calls would not survive session cloning.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfPushdownRule)
    e.injectOptimizerRule(_ => graft.plans.AsOfPruningRule)
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text) - distinct 3-gram shingle hashes"),
      exprs => ShingleHashes(exprs.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(hashes) - 16-wide MinHash signature"),
      exprs => MinHashSig(exprs.head)))
    e.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(hashes) - 32-bit SimHash"),
      exprs => SimHash32(exprs.head)))
    e.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(xxhash64(k)) - mergeable BloomFilter sketch"),
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs.head)))
    e.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain", "bloom_might_contain(bf, xxhash64(k)) - probe, no false negatives"),
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
