package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stage 3 — entity-link scoring: resolve each mention's subject/object
 * alias to a canonical entity, keeping the best-scoring candidate.
 *
 * The candidate table (alias, canonical, score) is derived from the
 * canonicalization map: a candidate scores 1.0 on exact alias identity,
 * 0.9 on case-insensitive match with the canonical form, 0.7 on
 * separator-stripped match. Top-1 per mention side is a single
 * `max_by(canonical, struct(score, canonical))` aggregation — no window
 * shuffle-sort needed.
 *
 * The alias→canonical table is vocabulary-sized, so both resolution
 * joins are explicitly `broadcast()` — at 10¹² mentions this is the
 * difference between two map-side joins and two full shuffles.
 */
object LinkScore {

  /** (alias, canonical, score) candidate catalog. */
  def candidates(aliasMap: DataFrame): DataFrame = {
    val strip = (c: org.apache.spark.sql.Column) => lower(regexp_replace(c, "[ _]", ""))
    aliasMap.select(
      col("alias"), col("canonical"),
      when(col("alias") === col("canonical"), 1.0)
        .when(lower(col("alias")) === lower(col("canonical")), 0.9)
        .when(strip(col("alias")) === strip(col("canonical")), 0.7)
        .otherwise(0.5).as("score"))
  }

  /** mentions + aliasMap → linked mentions with canonical subj/obj. */
  def link(mentions: DataFrame, aliasMap: DataFrame): DataFrame = {
    val cand = candidates(aliasMap)
    val subj = cand.select(col("alias").as("subj_alias"),
      col("canonical").as("s_cand"), col("score").as("s_score"))
    val obj = cand.select(col("alias").as("obj_alias"),
      col("canonical").as("o_cand"), col("score").as("o_score"))
    mentions
      .join(broadcast(subj), "subj_alias")
      .join(broadcast(obj), "obj_alias")
      .groupBy("doc_id", "span_idx", "rel")
      .agg(
        max_by(col("s_cand"), struct(col("s_score"), col("s_cand"))).as("subj"),
        max_by(col("o_cand"), struct(col("o_score"), col("o_cand"))).as("obj"))
      .select("doc_id", "span_idx", "subj", "rel", "obj")
  }
}
