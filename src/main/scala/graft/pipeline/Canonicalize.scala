package graft.pipeline

import graft.plans.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Stage 2 — entity canonicalization: connected components over the
 * candidate-alias similarity graph.
 *
 * Aliases observed in mentions are connected through *blocking keys*
 * (lowercase form, separator-stripped form): two aliases sharing a key
 * are candidate duplicates. The bipartite alias↔key graph feeds the
 * large-star/small-star CC ([[graft.plans.ConnectedComponents]]); the
 * component representative (lexicographic min alias) becomes the
 * canonical entity id. Keys are prefixed (`k1:`/`k2:`) so they can never
 * collide with alias ids, and are dropped from the final mapping.
 *
 * All of this is hash-shuffle work on the *distinct alias* set — orders
 * of magnitude smaller than the mention stream — so at 10¹² docs the CC
 * input is bounded by vocabulary size, not corpus size.
 */
object Canonicalize {

  /** distinct aliases → blocking-key edges. */
  def aliasKeyEdges(mentions: DataFrame): DataFrame = {
    val aliases = mentions.select(col("subj_alias").as("alias"))
      .union(mentions.select(col("obj_alias").as("alias")))
      .distinct()
    val k1 = aliases.select(col("alias").as("src"),
      concat(lit("k1:"), lower(col("alias"))).as("dst"))
    val k2 = aliases.select(col("alias").as("src"),
      concat(lit("k2:"), lower(regexp_replace(col("alias"), "[ _]", ""))).as("dst"))
    k1.union(k2)
  }

  /**
   * alias → canonical-entity map: run CC, then name each component by its
   * smallest *alias* member (keys are filtered out before the min).
   */
  def aliasMap(mentions: DataFrame): DataFrame = {
    val cc = ConnectedComponents.run(aliasKeyEdges(mentions))
    val aliasRows = cc.where(!col("id").startsWith("k1:") && !col("id").startsWith("k2:"))
    val repr = aliasRows.groupBy("component").agg(min("id").as("canonical"))
    aliasRows.join(repr, "component").select(col("id").as("alias"), col("canonical"))
  }
}
