package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Multimodal

/** Multimodal gate queries: binary payload columns + typed metadata,
  * decoded batched on executors (stub codec — see graft.functions
  * .Multimodal). The payload here is the document text's UTF-8 bytes
  * standing in for image/video bytes, so DuckDB can state the expected
  * stub features independently.
  *
  * Oracle caveat: the DuckDB oracles index by CHARACTER (substr/ord)
  * while the engine operates on payload BYTES — equivalent only because
  * the driver corpus is pure ASCII (verified: zero non-ASCII docs at
  * every SF). The Spark side is the byte-correct behavior.
  */
object MultimodalQueries {

  /** documents as a media table: (doc_id, payload binary, meta struct). */
  private def mediaTable(s: SparkSession, dir: String): DataFrame =
    documents(s, dir).select(
      col("doc_id"),
      to_binary(col("text"), lit("utf-8")).as("payload"),
      struct(col("lang"), col("source"), lit("image/fake").as("mime")).as("meta"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary → per-partition batched decode → fixed-schema features
    "mm_decode_stub" -> ((s, dir) => {
      Multimodal.decodeBatch(mediaTable(s, dir))
        .toDF().orderBy(col("doc_id"))
    }),

    // "video" frame sampling: every 4th 16-byte frame fingerprinted
    "mm_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(mediaTable(s, dir))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))
    }),

    // strided resize to a fixed 32-sample "resolution". The sample array
    // is emitted as a CSV string: an array-typed gate column crashes the
    // driver's pandas hasher (unhashable ndarray); int→string rendering
    // is identical in Spark and DuckDB so the compare stays exact.
    "mm_resize" -> ((s, dir) => {
      Multimodal.resize(mediaTable(s, dir))
        .toDF()
        .withColumn("pixels",
          concat_ws(",", col("pixels").cast("array<string>")))
        .orderBy(col("doc_id"))
    }),

    // fixed-dim feature extraction: 16-bin byte-value histogram (CSV
    // string output for the same reason as mm_resize)
    "mm_feature_extract" -> ((s, dir) => {
      Multimodal.extractFeatures(mediaTable(s, dir))
        .toDF()
        .withColumn("hist", concat_ws(",", col("hist").cast("array<string>")))
        .orderBy(col("doc_id"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "mm_decode_stub" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
        |       substr(md5(text), 1, 8) AS sig
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(j AS INTEGER) AS frame_idx,
        |       substr(md5(substr(text, CAST(j * 16 + 1 AS INTEGER), 16)), 1, 8) AS frame_sig
        |FROM (SELECT doc_id, text,
        |             UNNEST(range(0, octet_length(encode(text)) // 16, 4)) AS j
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id,
        |       CAST(least(32, octet_length(encode(text))) AS INTEGER) AS out_len,
        |       array_to_string(
        |         list_transform(range(0, least(32, octet_length(encode(text)))),
        |           i -> CAST(ord(substr(text,
        |                  CAST(least(i * greatest(1, octet_length(encode(text)) // 32),
        |                             octet_length(encode(text)) - 1) + 1 AS INTEGER),
        |                  1)) AS INTEGER)), ',') AS pixels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_feature_extract" ->
      """SELECT doc_id,
        |       array_to_string(
        |         list_transform(range(0, 16), k ->
        |           CAST(len(list_filter(string_split(text, ''),
        |                  c -> ord(c) // 16 = k)) AS INTEGER)), ',') AS hist
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
