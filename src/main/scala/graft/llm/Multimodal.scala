package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Multimodal-column plumbing (north-star): media as opaque `binary`
  * columns with typed metadata, decode/feature steps as per-partition
  * iterator transforms.
  *
  * The actual codec libraries are not in this container, so the decode is a
  * STUB — `FakeCodec.decode` below is a deterministic stand-in that parses a
  * small synthetic header instead of real image bytes. Everything around it
  * (binary schema, partition-preserving mapPartitions with batched iterator,
  * typed output schema) is the real Spark plumbing a decode/resize/
  * frame-sample stage needs at 100 TB: per-partition setup cost amortized
  * over the iterator (codec init once per partition, not per row), no
  * driver collection, output schema declared so downstream pruning works.
  */
object Multimodal {

  /** `multimodal_meta` — typed metadata over a binary media column without
    * decoding: byte length and content digest. (Media here is synthesized
    * from text bytes — the point is the binary-column codepath.) */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("media", col("text").cast(BinaryType))
      .select(
        col("doc_id"),
        length(col("media")).cast(LongType).as("media_len"),
        md5(col("media")).as("digest"),
        sha2(col("media"), 256).as("digest256"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------------------

  case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String,
                       n_frames: Int)

  /** STUB codec: deterministic fake "decode" reading a synthetic header.
    * A real implementation would hand `bytes` to an image/audio library;
    * the Spark-side contract (bytes in, typed struct out, cheap and
    * exception-safe per row) is what matters. */
  object FakeCodec {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      MediaMeta(
        doc_id = docId,
        width = 16 + (b0 % 64) * 16,
        height = 16 + (b1 % 64) * 16,
        format = if (bytes.length % 2 == 0) "png" else "jpeg",
        n_frames = 1 + bytes.length % 8)
    }
  }

  /** Decode stage as a partition-preserving iterator transform: codec
    * "initialized" once per partition, rows streamed through it. Output is
    * a typed Dataset so Catalyst sees a real schema. */
  def decodeMedia(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id").cast(LongType), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition codec setup would go here (expensive init amortized)
        rows.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
      }
  }

  /** `multimodal_decode` — the decode stage end-to-end on synthesized
    * binary media. The stub's arithmetic is reproducible in SQL, so even
    * the stubbed decode stays oracle-checked. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val media = t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("media"))
    decodeMedia(spark, media).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("format"), col("n_frames"))
      .orderBy("doc_id")
  }

  /** `multimodal_features` — feature extraction over the binary media
    * column: a 16-bucket byte histogram (high nibble), normalized. Unlike
    * the decode stub this is REAL feature computation — the per-row byte
    * loop runs in mapPartitions (imperative per-partition logic, the same
    * shape a CNN embedding or MFCC extractor plugs into), and the output is
    * a fixed-width feature vector ready for the similarity operators. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val h = new Array[Long](16)
          bytes.foreach(b => h((b & 0xff) >> 4) += 1)
          val n = math.max(bytes.length, 1).toDouble
          (id, h.map(_ / n).toSeq)
        }
      }
      .toDF("doc_id", "feat")
      .select(col("doc_id") +: (0 until 16).map(i =>
        org.apache.spark.sql.functions.element_at(col("feat"), i + 1).as(s"h$i")): _*)
      .orderBy("doc_id")
  }

  /** Resize stage shape (STUB): halve the fake-decoded dimensions. A real
    * implementation hands pixels to a codec; the Spark contract — typed
    * struct in, typed struct out, per-partition execution — is identical. */
  def resizeMedia(spark: SparkSession, media: DataFrame, factor: Int): DataFrame =
    decodeMedia(spark, media).toDF()
      .select(col("doc_id"),
        (col("width") / factor).cast("int").as("width"),
        (col("height") / factor).cast("int").as("height"),
        col("format"))

  /** Frame-sampling stage shape: one media row fans out to n_frames rows
    * (posexplode of a synthesized frame index) — the row-multiplying step a
    * video pipeline needs, with partition-local fan-out only. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyNth: Int): DataFrame =
    decodeMedia(spark, media).toDF()
      .select(col("doc_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % everyNth === 0)
      .select("doc_id", "frame_idx")
}
