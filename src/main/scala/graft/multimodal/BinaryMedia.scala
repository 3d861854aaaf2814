package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque media record: the engine treats image/audio/video payloads as
  * binary columns plus a typed metadata struct — content stays opaque to
  * Catalyst, metadata stays prunable/filterable.
  */
final case class MediaRecord(id: Long, media: Array[Byte], format: String)

/** Decoded features for one media record. */
final case class MediaFeatures(id: Long, format: String, nBytes: Int,
                               features: Array[Float])

/** Binary media plumbing (north star, multimodal): schema, partitioning,
  * and batched feature extraction over opaque blobs.
  *
  * The DECODE step is a STUB by design: real image/audio codecs are not
  * in this container, so [[decodeStub]] computes a deterministic
  * byte-histogram "embedding" where a real decoder (JPEG -> pixels ->
  * CNN features, PCM -> mel spectrogram, ...) would run. Everything
  * around it — the typed Dataset schema, `mapPartitions` execution,
  * fixed-size batching (the shape an inference-server client needs), and
  * the float-vector output column — is real and tested, and is exactly
  * the plumbing that scales: one task per partition, batches amortize
  * per-call overhead, no driver involvement.
  */
object BinaryMedia {

  /** Batch size for the (stubbed) decoder call — the unit a real
    * implementation would send to a GPU/inference endpoint.
    */
  val DecodeBatchSize = 32

  /** Lift a text corpus into the media shape: blob = UTF-8 bytes, typed
    * metadata struct alongside. With real media this is a parquet/
    * binaryFile scan — the downstream plumbing is identical.
    */
  def mediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("text/plain").as("format"),
        octet_length(col(textCol).cast("binary")).as("n_bytes"),
        sha2(col(textCol).cast("binary"), 256).as("fingerprint")).as("meta"))

  /** STUB decoder: deterministic byte-bucket histogram, L1-normalized.
    * Stands in for the real decode+featurize; same signature, same
    * batch-in/features-out shape.
    */
  def decodeStub(batch: Seq[MediaRecord], dim: Int): Seq[MediaFeatures] =
    batch.map { r =>
      val hist = new Array[Float](dim)
      var i = 0
      while (i < r.media.length) {
        hist((r.media(i) & 0xff) % dim) += 1f
        i += 1
      }
      val total = math.max(1, r.media.length).toFloat
      var j = 0
      while (j < dim) { hist(j) /= total; j += 1 }
      MediaFeatures(r.id, r.format, r.media.length, hist)
    }

  /** Distributed feature extraction: per-partition iteration in
    * fixed-size batches through the decoder. No shuffle — the features
    * column is born on the same partitioning as the input, ready for a
    * downstream similarity join (see graft.queries.Similarity).
    */
  def extractFeatures(media: Dataset[MediaRecord],
                      dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(b => decodeStub(b, dim))
    }
  }
}
