package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed partition-wise in batches (the Scala analogue
  * of a Pandas-UDF/mapInPandas stage: one JVM decode context per
  * partition, rows handled in bounded chunks).
  *
  * The actual media decode is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake pixels from the
  * payload bytes. Everything around it — the binary column, metadata
  * struct, partition batching, feature schema — is real and tested.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata. */
  case class Asset(
      asset_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int)

  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      checksum: Long,
      features: Array[Float])

  /** Synthesize an assets table from `documents` (deterministic: payload =
    * UTF-8 of the text, dimensions derived from doc fields). Stands in for
    * `spark.read.format("binaryFile")` at 100 TB.
    */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    T.t(spark, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        expr("CAST(32 + n_chars % 97 AS INT)").as("width"),
        expr("CAST(32 + n_chars % 71 AS INT)").as("height"))
      .as[Asset]
  }

  /** STUB decode: a real implementation would hand `payload` to an image/
    * audio codec here. The fake is deterministic in the bytes so tests and
    * reruns agree. Returns `dim` fake "pixels" in [0, 1).
    */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40) & 0xffff).toFloat / 65536.0f
      j += 1
    }
    out
  }

  /** Partition-wise batched decode + feature extraction. Batches bound
    * decoder memory exactly like a Pandas-UDF batch size would.
    */
  def decodeFeatures(in: Dataset[Asset], dim: Int = 8, batchSize: Int = 256): Dataset[AssetFeatures] = {
    import in.sparkSession.implicits._
    in.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one decode context per batch in a real decoder; stubbed here
        batch.iterator.map { a =>
          val px = decodeStub(a.payload, dim)
          AssetFeatures(
            a.asset_id, a.kind, a.payload.length, a.width, a.height,
            a.payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007),
            px)
        }
      }
    }
  }

  /** "Resize": deterministic downsample of the fake pixel vector. */
  def resize(feats: Dataset[AssetFeatures], outDim: Int): DataFrame =
    feats.toDF().withColumn("features",
      expr(s"transform(sequence(1, $outDim), i -> element_at(features, " +
        s"CAST(ceil(i * size(features) / $outDim.0) AS INT)))"))

  /** The ops-registry entry: decode features, project scalars, order.
    * The stub decode is pure integer arithmetic over the payload bytes
    * (poly hash mod 2^64 → one LCG step), and the corpus is pure ASCII
    * (text chars == payload bytes, rule 21), so DuckDB CAN replay it:
    * the oracle folds the char codes in HUGEINT with explicit mod-2^64
    * wrap. Exact f0 parity: k/65536 is dyadic, float == double.
    * Previously rows-only (CORRECTNESS_r02 no_oracle).
    */
  val ops: Seq[Op] = Seq(
    Op("llm_multimodal_decode",
      (s, d) => {
        decodeFeatures(assets(s, d)).toDF()
          .select(
            col("asset_id"), col("kind"), col("n_bytes"), col("width"),
            col("height"), col("checksum"),
            expr("CAST(element_at(features, 1) AS DOUBLE)").as("f0"))
          .orderBy("asset_id")
      },
      Some("WITH b AS (SELECT doc_id, n_chars, strlen(text) AS n_bytes, " +
        "list_transform(range(1, strlen(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS bytes " +
        "FROM documents), " +
        "h AS (SELECT doc_id, n_chars, n_bytes, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), bytes), (acc, c) -> (acc * 31 + c) % 1000000007) AS checksum, " +
        "list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), list_transform(bytes, x -> CAST(x AS HUGEINT))), " +
        "(acc, c) -> (acc * 31 + c) % 18446744073709551616) AS h0 " +
        "FROM b) " +
        "SELECT doc_id AS asset_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(n_bytes AS INTEGER) AS n_bytes, " +
        "CAST(32 + n_chars % 97 AS INTEGER) AS width, " +
        "CAST(32 + n_chars % 71 AS INTEGER) AS height, " +
        "checksum, " +
        "CAST(CAST(((h0 * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 " +
        "// 1099511627776) % 65536 AS BIGINT) AS DOUBLE) / 65536.0 AS f0 " +
        "FROM h ORDER BY asset_id")),

    // binary-payload metadata extraction — the oracle-checkable half of
    // the multimodal path: Spark works on a real BinaryType column
    // (octet_length / md5 / first byte of the payload); DuckDB computes
    // the same values from the source text, whose UTF-8 bytes ARE the
    // payload. Pure per-row map stage over the binary column.
    Op("llm_binary_stats",
      (s, d) => assets(s, d).toDF()
        .select(col("asset_id"), col("kind"),
          expr("octet_length(payload)").cast("long").as("n_bytes"),
          md5(col("payload")).as("digest"),
          expr("ascii(decode(substring(payload, 1, 1), 'UTF-8'))").as("first_byte"))
        .orderBy("asset_id"),
      Some("SELECT doc_id AS asset_id, " +
        "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
        "CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS digest, " +
        "ascii(text) AS first_byte " +
        "FROM documents ORDER BY asset_id")),

    // frame sampling over the binary payload: every 4th 64-byte frame
    // (byte offsets 0, 256, 512, …) with a per-frame digest — the video
    // frame-extraction access pattern as pure Spark plumbing
    // (sequence + explode + binary substring stays in codegen; a real
    // codec replaces the digest step). Oracle-checkable because the
    // payload IS the doc text's UTF-8 bytes and the corpus is pure ASCII
    // (strlen == length for every row), so DuckDB's char slices equal
    // the byte slices.
    // "resize" over the decoded pixel vector: 8 fake pixels downsampled
    // to 4 by index selection (ceil(i * 8 / 4) -> positions 2,4,6,8) —
    // the Spark-side plumbing of an image-resize stage (schema, batch
    // decode, vector transform) with the codec stubbed. The oracle
    // replays the whole pixel LCG in HUGEINT (eight chained mod-2^64
    // steps) and picks the same positions.
    Op("llm_multimodal_resize",
      (s, d) => resize(decodeFeatures(assets(s, d)), 4)
        .select(col("asset_id"), col("kind"),
          expr("CAST(element_at(features, 1) AS DOUBLE)").as("r1"),
          expr("CAST(element_at(features, 2) AS DOUBLE)").as("r2"),
          expr("CAST(element_at(features, 3) AS DOUBLE)").as("r3"),
          expr("CAST(element_at(features, 4) AS DOUBLE)").as("r4"))
        .orderBy("asset_id"),
      Some {
        val M = "18446744073709551616"
        val step = (prev: String, cur: String) =>
          s"(($prev * 6364136223846793005 + 1442695040888963407) % $M) AS $cur"
        val pix = (v: String) =>
          s"CAST(CAST(($v // 1099511627776) % 65536 AS BIGINT) AS DOUBLE) / 65536.0"
        "WITH b AS (SELECT doc_id, " +
          "list_transform(range(1, strlen(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT)) AS bytes " +
          "FROM documents), " +
          "h AS (SELECT doc_id, " +
          "list_reduce(list_prepend(CAST(1125899906842597 AS HUGEINT), list_transform(bytes, x -> CAST(x AS HUGEINT))), " +
          s"(acc, c) -> (acc * 31 + c) % $M) AS h0 FROM b), " +
          s"k1 AS (SELECT doc_id, ${step("h0", "v1")} FROM h), " +
          s"k2 AS (SELECT doc_id, v1, ${step("v1", "v2")} FROM k1), " +
          s"k3 AS (SELECT doc_id, v2, ${step("v2", "v3")} FROM k2), " +
          s"k4 AS (SELECT doc_id, v2, v3, ${step("v3", "v4")} FROM k3), " +
          s"k5 AS (SELECT doc_id, v2, v4, ${step("v4", "v5")} FROM k4), " +
          s"k6 AS (SELECT doc_id, v2, v4, v5, ${step("v5", "v6")} FROM k5), " +
          s"k7 AS (SELECT doc_id, v2, v4, v6, ${step("v6", "v7")} FROM k6), " +
          s"k8 AS (SELECT doc_id, v2, v4, v6, ${step("v7", "v8")} FROM k7) " +
          "SELECT doc_id AS asset_id, " +
          "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind, " +
          s"${pix("v2")} AS r1, ${pix("v4")} AS r2, ${pix("v6")} AS r3, ${pix("v8")} AS r4 " +
          "FROM k8 ORDER BY asset_id"
      }),

    Op("llm_frame_sample",
      (s, d) => assets(s, d).toDF()
        .select(col("asset_id"),
          col("payload"),
          explode(expr("sequence(0, octet_length(payload) - 1, 256)")).as("off"))
        .select(col("asset_id"),
          expr("CAST(off div 64 AS INT)").as("frame_idx"),
          expr("octet_length(substring(payload, off + 1, 64))").cast("int").as("n_bytes"),
          md5(expr("substring(payload, off + 1, 64)")).as("digest"))
        .orderBy("asset_id", "frame_idx"),
      Some("SELECT doc_id AS asset_id, CAST(off // 64 AS INTEGER) AS frame_idx, " +
        "CAST(strlen(substr(text, off + 1, 64)) AS INTEGER) AS n_bytes, " +
        "md5(substr(text, off + 1, 64)) AS digest " +
        "FROM (SELECT doc_id, text, unnest(range(0, strlen(text), 256)) AS off FROM documents) " +
        "ORDER BY asset_id, frame_idx")),
  )
}
