package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column surface: binary payload + typed metadata, and the
  * per-partition decode path. `m_asset_meta` is oracle-checked (deterministic
  * metadata); `m_decode` exercises the mapPartitions codec plumbing and is
  * covered by the driver's rows-only check + ScalaTest (the stub checksum is
  * not SQL-expressible).
  */
object MultimodalOps {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m_asset_meta" -> ((s, dir) => {
      Multimodal.assetsFromDocuments(Tables.load(s, dir, "documents"), "doc_id", "text")
        .select("asset_id", "modality", "byte_len", "format")
    }),
    "m_decode" -> ((s, dir) => {
      Multimodal.decodeFeatures(
        Multimodal.assetsFromDocuments(Tables.load(s, dir, "documents"), "doc_id", "text"))
    }),
    "m_frames" -> ((s, dir) => {
      // frame fan-out metadata (frame bytes themselves stay binary-opaque);
      // byte accounting is oracle-checkable
      Multimodal.sampleFrames(
        Multimodal.assetsFromDocuments(Tables.load(s, dir, "documents"), "doc_id", "text"),
        strideBytes = 64)
        .groupBy("asset_id")
        .agg(count(lit(1)).cast("int").as("n_frames"),
          sum(length(col("frame_bytes"))).cast("bigint").as("total_bytes"))
    }),
    "m_embed_knn" -> ((s, dir) => {
      // full media pipeline shape: payload → stub embedding → exact kNN
      val assets = Multimodal.assetsFromDocuments(
        Tables.load(s, dir, "documents"), "doc_id", "text")
      val embedded = Multimodal.embedStub(assets, dim = 16)
      graft.operators.Similarity.knnBrute(embedded, "asset_id", "embedding",
        queryId = 0L, k = 10)
    })
  )

  val oracles: Map[String, String] = Map(
    "m_frames" ->
      """SELECT doc_id AS asset_id,
                CAST(greatest(1, (octet_length(encode(text)) + 63) // 64) AS INTEGER) AS n_frames,
                CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
         FROM documents""",
    "m_asset_meta" ->
      """SELECT doc_id AS asset_id,
                (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS modality,
                CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
                (['jpeg','wav','mp4'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS format
         FROM documents"""
  )
}
