package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL access to Spark's runtime-filter Bloom expressions (Catalyst ships
  * them for its own InjectRuntimeFilter rule but does not register them
  * in the public function registry):
  *
  *  - `bloom_agg(xxhash64(k))` builds a BloomFilter over a key stream
  *    (mergeable binary sketch, map-side partial aggregation);
  *  - `bloom_might_contain(bf, xxhash64(k))` probes it (no false
  *    negatives).
  *
  * The use-case is semi-join reduction: build a bloom over the fact
  * side's keys, pre-filter the other side before the exact join. Results
  * stay exact — false positives only reduce how much the filter prunes.
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    val fr = spark.sessionState.functionRegistry
    fr.createOrReplaceTempFunction("bloom_agg",
      exprs => new BloomFilterAggregate(exprs.head), "built-in")
    fr.createOrReplaceTempFunction("bloom_might_contain",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
