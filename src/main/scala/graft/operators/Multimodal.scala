package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.l): media as opaque `binary`
  * columns with typed metadata, processed by batch-shaped per-partition
  * decode stubs.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub (`StubDecoder`) — but everything
  * around it is the real production shape: a binary payload column,
  * per-frame slicing with ordinary expressions, metadata checksums that an
  * ANSI-SQL oracle can recompute byte-for-byte (payloads here are ASCII,
  * so DuckDB's varchar md5 hashes the identical bytes), and a
  * `mapPartitions` feature extractor that processes rows in batches the
  * way a vectorized decoder would.
  *
  * Scale notes: payloads stay columnar parquet binary (never strings in
  * flight); frame explosion is bounded (ceil(len/64) frames); the decode
  * stub is per-partition so a real codec would amortize model/codec init
  * across a partition, the exact pattern `mapInPandas`/`mapPartitions`
  * batch UDFs use on a cluster.
  */
object Multimodal {

  /** Documents with a synthetic binary payload column (the fixture set has
    * no media blobs; text bytes stand in — the engine-side plumbing is
    * identical). */
  private def withPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))

  /** Typed metadata over the binary column: byte length, content digest,
    * frame count (64-byte frames). */
  def binaryMetadata(spark: SparkSession, dir: String): DataFrame =
    withPayload(Tables(spark, dir).documents)
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("content_md5"),
        ceil(octet_length(col("payload")) / lit(64.0)).cast("long").as("n_frames"))
      .orderBy(col("doc_id"))

  /** Stride-2 downsample of the payload — the deterministic stand-in for
    * image resize (the container has no codecs; a real pipeline swaps the
    * stride expression for a decode→resize→encode batch UDF, the
    * surrounding plumbing is unchanged). Regex `(.).` keeps the first
    * byte of every pair (odd-length tail byte retained unmatched) — a
    * codegen'd per-row expression both engines evaluate identically on
    * ASCII payloads, so the output digests are exactly oracle-checkable. */
  def resizePayload(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        regexp_replace(col("text"), "(.).", "$1").as("resized"))
      .select(col("doc_id"), col("n_bytes"),
        octet_length(col("resized")).cast("long").as("resized_bytes"),
        md5(col("resized")).as("resized_md5"))
      .orderBy(col("doc_id"))

  /** Frame sampling: slice the payload into 64-byte frames (posexplode over
    * a computed frame index range), checksum each frame — the batch shape
    * of video frame extraction. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    withPayload(Tables(spark, dir).documents)
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0),
          ceil(octet_length(col("payload")) / lit(64.0)).cast("int") - lit(1)))
          .as(Seq("frame_idx", "frame_no")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(substr(col("payload"), col("frame_idx") * lit(64) + lit(1), lit(64)))
          .as("frame_md5"),
        least(octet_length(col("payload")) - col("frame_idx") * lit(64), lit(64))
          .cast("long").as("frame_len"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** STUB decoder — stands in for an image/audio codec (none in this
    * container). Deterministic per-byte "feature extraction" so tests are
    * exact; a real implementation swaps `decode` only. */
  object StubDecoder {
    final case class Features(doc_id: Long, mean_byte: Double, max_byte: Int,
        n_bytes: Int)
    /** ??? in spirit: replace with a real codec. Deterministic fake. */
    def decode(id: Long, payload: Array[Byte]): Features = {
      var sum = 0L
      var mx = 0
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b
        if (b > mx) mx = b
        i += 1
      }
      Features(id, if (payload.length == 0) 0.0 else sum.toDouble / payload.length,
        mx, payload.length)
    }
  }

  /** Per-partition batch feature extraction over the binary column — the
    * `mapPartitions` pattern a real decoder plugs into (codec init once
    * per partition, then a streamed batch of rows). */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    withPayload(Tables(spark, dir).documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real codecs initialize here, once per partition
        rows.map { case (id, payload) => StubDecoder.decode(id, payload) }
      }
      .toDF()
      .select(col("doc_id"), round(col("mean_byte"), 4).as("mean_byte"),
        col("max_byte").cast("long").as("max_byte"),
        col("n_bytes").cast("long").as("n_bytes"))
      .orderBy(col("doc_id"))
  }
}
