package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable join operators beyond Spark's built-in set. */
object Joins {

  /** Skew-resistant equi-join: salt the skewed (large) side's key N ways
    * and explode the small side across all salts, so one hot key spreads
    * over N reducers instead of one straggler. Result is identical to
    * `large.join(small, key)` (inner); AQE's skew handling covers sort-
    * merge joins, this covers the hash-partitioned paths it cannot.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int = 8): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** As-of join: for each left row, attach the latest right row with
    * `right.ts <= left.ts` for the same key.
    *
    * Implemented as union + sorted carry-forward: both sides shuffle ONCE
    * on the key, rows are ordered by (ts, side) within the key, and the
    * last non-null right payload is carried forward to each left row.
    * This is the shape that survives 100 TB — per-key work is linear,
    * unlike the broadcast-nested-loop + window emulation (which
    * rel_join_asof uses only because its oracle must be plain SQL).
    *
    * The right payload travels as ONE struct so all its fields come from
    * the same matched row. Right rows at ts equal to a left row's ts DO
    * match (<=); among equal-ts right rows the one latest in
    * (ts, tiebreak) order wins.
    *
    * @param tiebreak right-side column ordering equal-ts right rows
    *                 (highest wins), e.g. an event id.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tiebreak: String): DataFrame = {

    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(((payload :+ tiebreak).distinct).map(col).toIndexedSeq: _*).schema.fields)))
    val r0 = right
      .select((Seq(col(key), col(rightTs).as("__ts"), col(tiebreak).cast("long").as("__tb")) ++
        Seq(struct(((payload :+ tiebreak).distinct).map(col).toIndexedSeq: _*).as("__p"))).toIndexedSeq: _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r0, allowMissingColumns = true)

    // rights sort before lefts at equal ts (side 0 < 1) so `<=` matches;
    // among equal-ts rights the highest tiebreak sorts last and wins.
    val w = Window.partitionBy(key)
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__match", last("__p", ignoreNulls = true).over(w))
      .where("__side = 1")
      .drop("__ts", "__side", "__tb", "__p")
  }
}
