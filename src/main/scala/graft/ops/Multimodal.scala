package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata, and per-row decode/feature-extraction runs
  * batched per partition (the Scala analog of `mapInPandas`).
  *
  * The actual codec call is STUBBED (`decodeStub`): this container ships no
  * image/audio libraries, so the stub derives deterministic fake pixels from
  * the payload bytes. Everything around it — schema, encoders, partition
  * batching, feature shape — is real and tested; swapping `decodeStub` for a
  * JNI/javacv codec is a one-function change.
  *
  * Scale notes: binary payloads dominate row size, so operators here avoid
  * shuffling media bytes — feature extraction is a narrow map, and anything
  * relational happens AFTER projecting features/metadata (drop the blob
  * before any join/groupBy).
  */
object Multimodal {

  /** A media row: opaque payload + metadata. */
  case class Media(id: Long, payload: Array[Byte], format: String)

  /** Decoded features: metadata + fixed-width embedding. */
  case class MediaFeatures(
      id: Long, format: String, width: Int, height: Int,
      features: Array[Float])

  /** STUB — stands in for a real image decode (e.g. libjpeg via JNI).
    * Deterministic: "dimensions" and "pixels" are hashed from the payload,
    * so tests and re-runs agree byte-for-byte.
    */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
    val h0 = java.util.Arrays.hashCode(payload)
    val width = 16 + math.abs(h0 % 1024)
    val height = 16 + math.abs((h0 / 1024) % 1024)
    val feats = Array.tabulate(dim) { i =>
      val h = h0 * 31 + i * 2654435761L
      ((h % 1000L) / 1000.0).toFloat
    }
    (width, height, feats)
  }

  /** Batched per-partition decode + feature extraction (mapPartitions: one
    * iterator pass per partition, no per-row task overhead — the place a
    * real implementation amortizes codec/context setup).
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Real impl: initialize the codec ONCE here, then stream the batch.
      it.map { m =>
        val (w, h, f) = decodeStub(m.payload, dim)
        MediaFeatures(m.id, m.format, w, h, f)
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
}
