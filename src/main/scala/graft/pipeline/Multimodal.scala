package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata structs, plus batch "decode" /
  * feature-extract / resize / frame-sample stages.
  *
  * The actual codecs are NOT in this environment, so the decode kernel is a
  * clearly-marked deterministic stub ([[FakeCodec]]) — but everything Spark
  * cares about is real: the binary column schema, the typed case-class
  * batch shape, the `mapPartitions` boundary (one codec init per partition,
  * streaming iterator — the Scala analog of `mapInPandas` batching), and the
  * partition sizing (`maxRecordsPerFile` / `files.maxPartitionBytes` keep a
  * partition's worth of payloads in executor memory at 100 TB).
  */
object Multimodal {

  /** A multimodal row: payload + typed metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata batch shape (what a real image decode would yield). */
  final case class DecodedMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Deterministic stand-in for the image/audio codec. A real deployment
    * swaps `decode` for the codec call; the signature and batching stay. */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Int, Long) = {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
      // ??? real codec here — dimensions derived deterministically instead
      (n % 640, (n * 7) % 480, n % 16, sum)
    }

    /** ??? real resampler here — the output byte budget (outW·outH) and
      * determinism stand in for the pixel math. */
    def resample(payload: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(outW * outH, 0))
      if (payload.nonEmpty) {
        var i = 0
        while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
      }
      out
    }

    /** ??? real feature extractor here — `dims` chunk-mean bytes scaled to
      * [0,1] stand in for the embedding model; output shape and batching
      * are the real contract. */
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      if (payload.isEmpty) return out
      val chunk = math.max(payload.length / dims, 1)
      var d = 0
      while (d < dims) {
        var s = 0L
        var i = d * chunk
        val end = math.min(payload.length, i + chunk)
        val n = math.max(end - i, 1)
        while (i < end) { s += payload(i) & 0xff; i += 1 }
        out(d) = s.toFloat / n / 255f
        d += 1
      }
      out
    }
  }

  /** Build a media table from the documents table: payload = utf-8 bytes of
    * the text (a deterministic opaque blob), kind keyed off the source. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batch decode over the binary column: one codec context per partition,
    * streaming per-row — the mapInPandas-equivalent shape. */
  def decodeBatch(media: DataFrame): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition codec init would go here (expensive native handle)
      rows.map { r =>
        val (w, h, f, cks) = FakeCodec.decode(r.payload)
        DecodedMeta(r.media_id, r.kind, r.payload.length.toLong, w, h, f, cks)
      }
    }
  }

  /** Metadata aggregate per kind — the SQL-expressible cross-check surface
    * (byte lengths are computable from the text column in any engine). */
  def metaByKind(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("kind"), length(col("payload")).as("n_bytes"))
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        max(col("n_bytes")).cast("long").as("max_bytes"))
      .orderBy("kind")

  /** A resized media row: bounded dimensions + the resampled payload. */
  final case class ResizedMedia(media_id: Long, kind: String,
      width: Int, height: Int, payload: Array[Byte])

  /** Resize stage: bound each payload to `maxW`×`maxH` — the batch
    * boundary, output schema, and per-row byte budget (outW·outH) are the
    * real contract; the pixel resampling is the documented [[FakeCodec]]
    * seam. Integer-only dimension math so the oracle replays it. */
  def resizeBatch(media: DataFrame, maxW: Int = 224, maxH: Int = 224): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val (w, h, _, _) = FakeCodec.decode(r.payload)
        val (ow, oh) = (math.min(w, maxW), math.min(h, maxH))
        ResizedMedia(r.media_id, r.kind, ow, oh, FakeCodec.resample(r.payload, ow, oh))
      }
    }
  }

  /** Per-media feature vector. `features` feeds the similarity operators
    * directly (brute-force / IVF / PQ all take an `array<float>` column). */
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** Feature-extract stage: payload → `dims`-dimensional embedding through
    * the per-partition codec boundary; composition with the ANN surface is
    * spec-proven (media → features → KNN). */
  def featureBatch(media: DataFrame, dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map(r => MediaFeatures(r.media_id, FakeCodec.features(r.payload, dims)))
    }
  }

  /** Frame-sample stage: explode a deterministic frame index per video,
    * keeping Spark-side fan-out semantics (one row per sampled frame). */
  def sampleFrames(decoded: Dataset[DecodedMeta], everyNth: Int = 4): DataFrame = {
    decoded.toDF()
      .filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))).as("frame_idx"))
  }
}
