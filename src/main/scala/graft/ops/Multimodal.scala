package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, and per-row decode/feature-extraction runs
  * batched per partition (the Scala analog of `mapInPandas`).
  *
  * The actual codec call is STUBBED (`decodeStub`): this container ships no
  * image/audio libraries. The stub is deterministic AND SQL-replicable —
  * every derived value (dimensions, checksum, features) is arithmetic over
  * the hex MD5 of the payload bytes, which any engine reproduces — so the
  * whole typed mapPartitions path sits on the oracle-verified surface
  * (q45_media_features) rather than being spec-only. Swapping `decodeStub`
  * for a JNI/javacv codec is a one-function change.
  *
  * Scale notes: binary payloads dominate row size, so operators here avoid
  * shuffling media bytes — feature extraction is a narrow map, and anything
  * relational happens AFTER projecting features/metadata (drop the blob
  * before any join/groupBy).
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  case class Media(id: Long, payload: Array[Byte], format: String)

  /** Decoded features: metadata + payload fingerprint + fixed-width
    * embedding. `checksum` is the shared 60-bit md5 convention
    * ([[graft.functions.TextFunctions.hash60]]), exactly reproducible in
    * SQL as `('0x' || substring(md5(payload),1,15))::BIGINT`.
    */
  case class MediaFeatures(
      id: Long, format: String, nBytes: Int, width: Int, height: Int,
      checksum: Long, features: Array[Float])

  /** STUB — stands in for a real image decode (e.g. libjpeg via JNI).
    * All outputs derive from the payload's hex MD5: "dimensions" from 3-hex-
    * digit slices, the 60-bit checksum from the first 15, features from
    * overlapping 8-hex windows scaled to [0,1). Deterministic across runs,
    * engines, and SQL replays.
    */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): MediaFeatures = {
    require(dim <= 24, "features window needs hex offsets j..j+8 within 32 chars")
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map(b => f"$b%02x").mkString
    def hexVal(off: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(off, off + len), 16)
    val width = 16 + (hexVal(0, 3) % 1024).toInt
    val height = 16 + (hexVal(3, 3) % 1024).toInt
    val checksum = hexVal(0, 15)
    val feats = Array.tabulate(dim)(j =>
      (hexVal(j, 8).toDouble / 4294967296.0).toFloat)
    MediaFeatures(0L, "", payload.length, width, height, checksum, feats)
  }

  /** Batched per-partition decode + feature extraction (mapPartitions: one
    * iterator pass per partition, no per-row task overhead — the place a
    * real implementation amortizes codec/context setup).
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real impl: initialize the codec ONCE here, then stream the batch.
      // NULL payloads (missing/unfetched media) are SKIPPED — the decode of
      // nothing is nothing, and a real codec would reject them anyway; at
      // scale these rows route to a dead-letter table upstream.
      it.filter(_.payload != null).map { m =>
        decodeStub(m.payload, dim).copy(id = m.id, format = m.format)
      }
    }
  }

  /** Declarative variant for pipelines that stay in DataFrame land: feature
    * j = xxhash64(payload, j) scaled to [0,1). Codegen'd, no JVM-object
    * round trip; used where the "decode" really is a cheap transform.
    */
  def hashFeatures(df: DataFrame, payloadCol: String, dim: Int): DataFrame =
    df.withColumn("features",
      transform(sequence(lit(0), lit(dim - 1)),
        j => (pmod(xxhash64(col(payloadCol), j), lit(1000L)).cast("double") / 1000.0)
          .cast("float")))

  /** Byte-stream downsample ("resize"): keep every ⌈n/target⌉-th byte so
    * the payload lands at ≤ `targetBytes`. This really is the
    * stride-decimation shape of a nearest-neighbor image downscale — the
    * codec-specific part (decode → pixel grid) is what `decodeStub`
    * stands in for; the byte plumbing here is real. Narrow map, payload
    * never shuffled, output strictly smaller — run it BEFORE any exchange
    * that must carry media.
    */
  def resize(media: Dataset[Media], targetBytes: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.payload.length
        if (n <= targetBytes) m
        else {
          val stride = math.ceil(n.toDouble / targetBytes).toInt
          val out = Array.ofDim[Byte]((n + stride - 1) / stride)
          var i = 0; var j = 0
          while (i < n) { out(j) = m.payload(i); i += stride; j += 1 }
          m.copy(payload = out)
        }
      }
    }
  }

  /** One sampled frame of a fixed-frame-size payload. */
  case class Frame(id: Long, frameIdx: Int, payload: Array[Byte])

  /** Frame sampling: treat the payload as concatenated `frameBytes`-sized
    * frames and emit every `everyK`-th one (plus the possibly-short tail
    * frame if sampled). The video-ingest shape: a flatMap whose output is
    * 1/everyK of its input bytes, so the expensive per-frame work
    * downstream (decode, embed) sees only sampled frames. Stays a narrow
    * op — nothing here shuffles the blob.
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int,
                   everyK: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && everyK > 0)
    media.mapPartitions { it =>
      // NULL payloads skipped, the extractFeatures convention: zero frames
      // of nothing, dead-letter upstream (caught by the degen sweep — a
      // NULL-text doc NPE'd here when q192 encoded text as the payload).
      it.filter(_.payload != null).flatMap { m =>
        val n = m.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames, everyK).map { f =>
          val from = f * frameBytes
          Frame(m.id, f,
            java.util.Arrays.copyOfRange(m.payload, from,
              math.min(from + frameBytes, n)))
        }
      }
    }
  }
}
