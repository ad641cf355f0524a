package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A timestamped document on the ingest stream (event time = fetch time). */
final case class TimedDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/**
 * Streaming exact deduplication — the incremental form of
 * [[graft.functions.Dedup.exact]]'s keeper semantics on the append path
 * (beyond-reference pipeline mandate, like [[StreamingStats]]): only the
 * FIRST document carrying a given text passes; later copies arriving
 * within the watermark horizon are dropped.
 *
 * State is keyed by md5(text) and EVICTED once the watermark passes a
 * key's horizon (`dropDuplicatesWithinWatermark`), so state size is
 * bounded by the horizon's distinct-text arrival rate — the only shape
 * that survives an unbounded crawl stream. Re-fetch duplicates cluster
 * within hours in practice, which is what the horizon models; exact
 * GLOBAL dedup across all time stays a batch responsibility
 * (Dedup.exact), same batch/streaming split as StreamingIngest's
 * alias-catalog side. Within one micro-batch the surviving row among
 * simultaneous duplicates is arbitrary (the batch path is the
 * order-free authority on keeper identity).
 */
object StreamingDedup {

  /** `docs` must carry a `text` column and the event-time column `ts`. */
  def dedupByText(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs.withColumn("text_md5", md5(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("text_md5")
}
