package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-A — sources & sinks.
  *
  * Snapflow's storage/format-conversion lattice (DataFrame <-> records <->
  * CSV <-> DB table) collapses onto Spark's reader/writer matrix; these ops
  * prove the parquet/CSV/JSON legs plus an explicit materialize-and-reread.
  */
object Sources {

  /** CSV round-trip: materialize `region` as CSV, read it back with an
    * explicit schema (snapflow `import_csv` with a declared schema).
    */
  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"target/tmp/csv_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    T.t(s, d, "region").write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.schema(schema).option("header", "true").csv(tmp)
      .orderBy("r_regionkey")
  }

  /** Materialize a block to parquet and read it back (snapflow's
    * StoredDataBlock persist step; Verify.scala does this for every op).
    */
  /** ORC leg of the format-conversion lattice. */
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"target/tmp/orc_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    T.t(s, d, "supplier").write.mode("overwrite").orc(tmp)
    s.read.orc(tmp).orderBy("s_suppkey")
  }

  /** JSON-lines leg: write region as JSONL, read back with an explicit
    * schema (JSON inference would widen int to bigint).
    */
  private def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"target/tmp/json_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    T.t(s, d, "region").write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    s.read.schema(schema).json(tmp).orderBy("r_regionkey")
  }

  private def parquetSink(s: SparkSession, d: String): DataFrame = {
    val tmp = s"target/tmp/snk_${d.replaceAll("[^A-Za-z0-9]", "_")}"
    T.t(s, d, "supplier").write.mode("overwrite").parquet(tmp)
    s.read.parquet(tmp).orderBy("s_suppkey")
  }

  val ops: Seq[Op] = Seq(
    Op("src_parquet_scan",
      (s, d) => T.t(s, d, "part").orderBy("p_partkey"),
      Some("SELECT * FROM part ORDER BY p_partkey")),

    Op("src_csv_roundtrip",
      csvRoundtrip,
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    Op("src_json_lines",
      (s, d) => T.events(s, d).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
        "FROM events ORDER BY event_id")),

    Op("snk_parquet_write",
      parquetSink,
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    Op("src_orc_roundtrip",
      orcRoundtrip,
      Some("SELECT * FROM supplier ORDER BY s_suppkey")),

    Op("src_json_roundtrip",
      jsonRoundtrip,
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),
  )
}
