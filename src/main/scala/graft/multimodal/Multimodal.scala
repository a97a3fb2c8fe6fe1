package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY §2.11 capability, B-mandate): image/audio/
  * video payloads ride through the engine as opaque BinaryType columns with
  * a typed metadata struct.
  *
  * The Spark-side contract is real and tested (schema, per-partition
  * batched processing, partitioning, content hashing, frame explosion);
  * the byte-level DECODE is a clearly-marked deterministic stub — this
  * container ships no image/audio codecs, and a production deployment
  * would swap `decodeStub` for a JNI/codec call without touching any of
  * the surrounding plan shape.
  *
  * Scale posture: feature extraction is mapPartitions (one codec init per
  * partition, not per row — the JVM analog of batched pandas UDFs);
  * payloads never shuffle except when explicitly repartitioned by key. */
object Multimodal {

  case class AssetMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  case class Asset(asset_id: Long, kind: String, payload: Array[Byte], meta: AssetMeta)
  case class AssetFeatures(asset_id: Long, kind: String, features: Array[Float])

  /** Content fingerprint + size stats per asset — pure built-ins. */
  def fingerprints(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("kind"),
      sha2(col("payload"), 256).as("content_hash"),
      length(col("payload")).as("n_bytes"),
      col("meta.width").as("width"), col("meta.height").as("height"))
      .orderBy("asset_id")

  /** STUB decode -> feature vector: deterministic bytes-derived floats.
    * Replace with a real codec in production; the mapPartitions batching,
    * case-class row contract and output schema are the real engine
    * surface. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var k = 0
    while (k < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(k) = (math.floorMod(h >>> 16, 2000L) - 1000L) / 1000.0f
      k += 1
    }
    out
  }

  /** Batched per-partition feature extraction (codec init once per
    * partition — the expensive part in a real deployment). */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // codec/session init would happen HERE, once per partition
      it.map(a => AssetFeatures(a.asset_id, a.kind, decodeStub(a.payload, dim)))
    }
  }

  /** Frame sampling for video assets: one row per sampled frame timestamp.
    * Pure relational explode — no decode needed to plan the work. */
  def sampleFrames(assets: DataFrame, everyMs: Long): DataFrame =
    assets.where(col("kind") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs))).as("frame_ms"))
      .orderBy("asset_id", "frame_ms")

  /** Resize is a metadata transform at plan time (the byte transform is the
    * same stubbed decode path); keeps the struct column typed. */
  def resizeMeta(assets: DataFrame, w: Int, h: Int): DataFrame =
    assets.withColumn("meta",
      struct(lit(w).as("width"), lit(h).as("height"),
        col("meta.sampleRate").as("sampleRate"),
        col("meta.durationMs").as("durationMs")))

  /** Deterministic in-memory corpus for tests (no binary fixture exists —
    * FIXTURES.md). */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val id = i
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val payload = Array.tabulate[Byte]((id % 64 + 16).toInt)(j => ((id * 31 + j * 7) % 127).toByte)
      Asset(id, kind, payload, AssetMeta(
        width = (64 + id % 512).toInt, height = (48 + id % 256).toInt,
        sampleRate = 16000, durationMs = 1000 + id % 9000))
    }
  }
}
