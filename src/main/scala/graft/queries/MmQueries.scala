package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY §2.11 multimodal columns — the DECLARED-query edition (r7).
  *
  * graft.multimodal proves the BinaryType plumbing (schema, mapPartitions
  * batching, stubbed decode) with unit tests only, because no binary
  * fixture exists. These queries close that gap inside the fixtures we
  * have: `CAST(text AS BINARY)` IS a real opaque byte column (the UTF-8
  * payload), and every operation here — octet census, content hashing,
  * magic-byte extraction, fixed-stride frame sampling with per-frame
  * fingerprints — is exactly what the image/audio ingest path runs
  * before any codec touches the bytes. All row-local map work (scales
  * embarrassingly; no shuffle before the final sort), fully oracled.
  *
  * Portability notes: the ONE hex rendering (upper(hex(bytes))) is
  * derived first and every frame/offset op works on it — 1-based, 2 hex
  * chars per byte, so byte offset b = hex offset 2b+1; substring clamps
  * identically past the end on both engines (the last partial frame).
  * The full-payload content hash runs on the raw BLOB (sha2/sha256 —
  * the hash60 parity family). Frame fingerprints hash the hex SLICE
  * (VARCHAR on both engines) so no engine-specific blob slicing is
  * needed. */
object MmQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-asset binary feature census: byte count, sha-256 content
    // fingerprint (the exact-dedup key for any modality), the 4-byte
    // magic prefix a format sniffer reads, the 256-byte frame grid
    // (count + distinct-frame census — the frame-sample dedup signal a
    // video pipeline computes before decode), and a mid-payload probe.
    "mm_binary_features" -> ((s, d) =>
      Tables.documents(s, d)
        .selectExpr("doc_id", "CAST(text AS BINARY) AS bin")
        .selectExpr("doc_id", "bin",
          "CAST(length(bin) AS BIGINT) AS n_bytes",
          "upper(hex(bin)) AS hx")
        .selectExpr(
          "doc_id",
          "n_bytes",
          "sha2(bin, 256) AS content_hash",
          "substring(hx, 1, 8) AS magic_hex",
          "(n_bytes + 255) DIV 256 AS n_frames",
          // r8 (ADVICE): an empty payload has 0 frames, so its
          // distinct-frame census is 0, not the 1 empty-slice hash the
          // GREATEST(...,1) grid would emit — keep n_frames and
          // n_uniq_frames internally consistent for n_bytes = 0.
          "CASE WHEN n_bytes = 0 THEN CAST(0 AS BIGINT) ELSE " +
            "CAST(size(array_distinct(transform(" +
            "sequence(0, GREATEST(CAST((n_bytes + 255) DIV 256 AS INT), 1) - 1), " +
            "k -> sha2(substring(hx, k*512 + 1, 512), 256)))) AS BIGINT) END " +
            "AS n_uniq_frames",
          "substring(hx, CAST(n_bytes DIV 2 AS INT) * 2 + 1, 16) AS mid_hex")
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "mm_binary_features" ->
      // DuckDB's sha256 is VARCHAR-only (no BLOB overload) — sha256(text)
      // hashes the identical UTF-8 bytes Spark's sha2(bin, 256) sees
      // (the hash60 parity family).
      ("WITH b AS (SELECT doc_id, text, encode(text) AS bin FROM documents), " +
        "h AS (SELECT doc_id, text, CAST(octet_length(bin) AS BIGINT) AS n_bytes, " +
        "upper(hex(bin)) AS hx FROM b) " +
        "SELECT doc_id, n_bytes, " +
        "sha256(text) AS content_hash, " +
        "substring(hx, 1, 8) AS magic_hex, " +
        "(n_bytes + 255) // 256 AS n_frames, " +
        "CASE WHEN n_bytes = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST(len(list_distinct(list_transform(" +
        "range(0, GREATEST((n_bytes + 255) // 256, 1)), " +
        "k -> sha256(substring(hx, CAST(k*512 + 1 AS INT), 512))))) AS BIGINT) END " +
        "AS n_uniq_frames, " +
        "substring(hx, CAST(n_bytes // 2 AS INT) * 2 + 1, 16) AS mid_hex " +
        "FROM h ORDER BY doc_id")
  )
}
