package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A timestamped fact on the stream (event time = extraction time). */
final case class TimedTriple(
    subj: String, pred: String, obj: String, ts: java.sql.Timestamp)

/** Output row of the streaming new-entity tracker. */
final case class NewEntity(entity: String, first_seen: java.sql.Timestamp)

/**
 * Streaming KB statistics — beyond the reference (which is batch-only):
 * the incremental forms of the stats/monitoring surface a production KG
 * build needs while triples stream in.
 *
 *  - [[windowedRelationCounts]]: per-relation fact counts over tumbling
 *    event-time windows with a watermark — late data beyond the
 *    watermark is dropped, state is bounded, and the aggregation is the
 *    streaming analog of the batch stats pass (KGStats).
 *  - [[newEntities]]: first-seen entity tracking via
 *    `mapGroupsWithState` — the streaming analog of KB.newEntities
 *    (reference KB.java:4273-4292): each entity is emitted exactly once,
 *    on the micro-batch where it first appears.
 */
object StreamingStats {

  /**
   * Tumbling-window per-relation counts. One shuffle per micro-batch on
   * (window, pred); the watermark bounds both state size and late-data
   * acceptance — at 10¹² facts/day this is the only shape whose state
   * does not grow with the stream.
   */
  def windowedRelationCounts(
      triples: DataFrame,
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    triples
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("pred"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("pred"), col("n"))

  /**
   * Entities never seen before, emitted once with their first-seen
   * timestamp. Keyed state = one boolean per entity (the reference keeps
   * the same information in its in-memory entity key sets); production
   * deployments bound it with state-store TTL if the entity universe is
   * unbounded.
   */
  def newEntities(triples: Dataset[TimedTriple]): Dataset[NewEntity] = {
    import triples.sparkSession.implicits._
    triples
      .flatMap(t => Seq((t.subj, t.ts), (t.obj, t.ts)))
      .groupByKey(_._1)
      .mapGroupsWithState[Boolean, Option[NewEntity]](GroupStateTimeout.NoTimeout) {
        case (entity, rows, state: GroupState[Boolean]) =>
          if (state.exists) None
          else {
            state.update(true)
            val firstTs = rows.map(_._2).minBy(_.getTime)
            Some(NewEntity(entity, firstTs))
          }
      }
      .flatMap(_.toSeq)
  }

  /** Output mode for the windowed counts sink: Append emits each window
    * once, when the watermark passes its end — the exactly-once shape
    * for downstream parquet. */
  val WindowedOutputMode: OutputMode = OutputMode.Append()
}
