package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media asset: opaque bytes + typed metadata (the multimodal column
  * convention — media is `binary`, never parsed by Catalyst). */
final case class MediaAsset(
    media_id: String,
    kind: String,          // "image" | "audio" | "video"
    payload: Array[Byte],  // opaque encoded bytes
    byte_len: Long,
    header_hex: String)    // first-4-bytes magic, for format sniffing

/** Decoded (stubbed) media features. */
final case class MediaFeatures(
    media_id: String,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/**
 * Multimodal column plumbing: images/audio/video ride through the engine
 * as opaque `binary` columns with typed metadata; decode/feature-extract
 * runs batched per partition (`mapPartitions` over a typed Dataset — the
 * Scala analog of `mapInPandas`: one iterator per partition, vectorizable
 * batch shape, no per-row JVM↔native crossings).
 *
 * STUB NOTICE: this container has no image/audio codecs, so
 * [[decodeStub]] is a clearly-marked deterministic fake (derives fake
 * dimensions and a fake feature vector from the payload bytes). The
 * Spark-side plumbing — schema, partitioning, batch iteration, binary
 * handling — is real and tested; swapping in a real codec replaces ONE
 * function body.
 */
object Multimodal {

  /** Wrap a text corpus into fake media assets (payload = UTF-8 bytes):
    * deterministic stand-in for reading a real media table. */
  def assetsFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("m"), col("doc_id")).as("media_id"),
      // deterministic kind from the doc id — md5-derived so any engine
      // (incl. the DuckDB oracle) computes the same assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (expr(s"${TextOps.tokHash32("cast(doc_id as string)")} % 3") + 1).cast("int"))
        .as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
      .withColumn("header_hex", lower(substring(hex(col("payload")), 1, 8)))

  /** DETERMINISTIC FAKE of the decode step (see stub notice). Real
    * implementation would parse payload with a codec; the fake derives
    * stable pseudo-dimensions from the first payload bytes. */
  def decodeStub(a: MediaAsset): MediaFeatures = {
    val b0 = if (a.payload.length > 0) a.payload(0) & 0xff else 0
    val b1 = if (a.payload.length > 1) a.payload(1) & 0xff else 0
    val feature = Array.tabulate(8)(i =>
      ((a.payload.length + i * 31 + b0) % 97).toFloat / 97f)
    MediaFeatures(
      media_id = a.media_id,
      kind = a.kind,
      width = 16 + b0 % 64,
      height = 16 + b1 % 64,
      n_frames = if (a.kind == "video") 1 + (a.payload.length % 30) else 1,
      feature = feature)
  }

  /** Batched decode: one partition = one batch iterator (keep partitions
    * sized by `spark.sql.files.maxPartitionBytes` so a batch of decoded
    * frames fits executor memory). */
  def decodeFeatures(spark: SparkSession, assets: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.as[MediaAsset].mapPartitions(_.map(decodeStub))
  }

  /** Relational metadata pass over the binary column — no decode, pure
    * Catalyst (octet_length/substring/hex work on binary natively). */
  def mediaStats(assets: DataFrame): DataFrame =
    assets.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(col("byte_len")).as("total_bytes"),
      min(col("byte_len")).as("min_bytes"),
      max(col("byte_len")).as("max_bytes"),
      countDistinct(col("header_hex")).as("distinct_headers"))
}
