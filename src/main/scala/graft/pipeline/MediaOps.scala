package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: treat media payloads as opaque `binary`
  * columns with typed metadata, and run batched "decode / feature-extract"
  * over executor partitions with a typed Dataset (the Scala analogue of a
  * Pandas-UDF-over-mapInPandas pipeline: Iterator-in/Iterator-out per
  * partition, processed in fixed-size batches so a real decoder could
  * vectorize or reuse native buffers).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from the
  * bytes. The Spark-side plumbing — schema, encoders, partition batching,
  * map-side-only execution — is real and is what carries over to a real
  * decoder at 100 TB (one pass, no shuffle until the final rollup).
  */
object MediaOps {

  /** Opaque media record: id + raw bytes + declared format. */
  final case class MediaIn(doc_id: Long, content: Array[Byte], fmt: String)

  /** Extracted features (fake, deterministic — see [[decodeStub]]).
    * `checksum` is the first 8 hex chars of md5(payload) as a BIGINT — a
    * payload digest a real decoder would also emit (content addressing /
    * corruption detection), chosen over a float "luma" so the driver's
    * DuckDB oracle can recompute the rollup exactly (md5 is portable;
    * integer sums are exact). */
  final case class MediaFeature(doc_id: Long, n_bytes: Long, n_frames: Long,
                                checksum: Long, fmt: String)

  /** Batch size for the per-partition decode loop — the shape a vectorized
    * decoder (or a JNI codec with reusable buffers) wants. */
  val DecodeBatchSize = 64

  /** STUB decoder: a real implementation would decode image/audio/video
    * bytes here. The fake is deterministic in the payload bytes so tests and
    * the driver's hash gate are stable. */
  private def decodeStub(in: MediaIn): MediaFeature = {
    val bytes = in.content
    val n = bytes.length.toLong
    // "frame count": 1 frame per 1000 bytes, at least 1
    val frames = n / 1000 + 1
    // payload digest: first 8 hex chars of md5 as unsigned int (< 2^32)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
    val checksum = java.lang.Long.parseLong(hex, 16)
    MediaFeature(in.doc_id, n, frames, checksum, in.fmt)
  }

  /** Batched per-partition decode: Iterator-in/Iterator-out, grouping rows
    * into [[DecodeBatchSize]] chunks (a real decoder would process a chunk
    * per native call). Map-side only — no shuffle. */
  def decode(ds: Dataset[MediaIn]): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch => batch.map(decodeStub) }
    }
  }

  /** Driver-contract query: documents → opaque binary payloads → batched
    * stub decode → per-format rollup. All-integer aggregates (counts, byte/
    * frame totals, digest sum), so the DuckDB oracle in PipelineOps
    * reproduces the values bit-for-bit — the full hash gate applies even
    * though the decode itself runs in typed mapPartitions. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        lit("text/plain").as("fmt"))
      .as[MediaIn]
    MediaOps.decode(media)
      .groupBy($"fmt")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        sum($"n_frames").as("total_frames"),
        sum($"checksum").as("checksum_sum"))
      .orderBy($"fmt")
  }
}
