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

  /** distinct aliases → blocking-key edges. One scan of the mention
    * stream (explode both sides in place), not one per side. */
  def aliasKeyEdges(mentions: DataFrame): DataFrame = {
    val aliases = mentions
      .select(explode(array(col("subj_alias"), col("obj_alias"))).as("alias"))
      .distinct()
    val k1 = aliases.select(col("alias").as("src"),
      concat(lit("k1:"), lower(col("alias"))).as("dst"))
    val k2 = aliases.select(col("alias").as("src"),
      concat(lit("k2:"), lower(regexp_replace(col("alias"), "[ _]", ""))).as("dst"))
    k1.union(k2)
  }

  /**
   * alias → canonical-entity map.
   *
   * Key contraction first: every blocking-key group is a star, so one
   * `groupBy(key).min(alias)` collapses each key to alias→representative
   * edges — this removes the key nodes, halves the graph, and cuts the
   * diameter before the generic CC loop runs (each saved CC iteration is
   * a full shuffle round at 10⁹-alias scale). Connectivity is preserved
   * exactly: two aliases share a key iff both link to that key's rep.
   */
  def aliasMap(mentions: DataFrame): DataFrame = {
    // materialize once: the alias-key edge set is reused three times below
    // (reps, contraction join, singleton fallback) and is vocabulary-sized
    val edges = aliasKeyEdges(mentions).localCheckpoint(true) // (src = alias, dst = key)
    val reps  = edges.groupBy("dst").agg(min("src").as("rep"))
    val contracted = edges.join(reps, "dst")
      .where(col("src") =!= col("rep"))
      .select(col("src"), col("rep").as("dst"))
    val cc = ConnectedComponents.run(contracted)
    val repr = cc.groupBy("component").agg(min("id").as("canonical"))
    val mapped = cc.join(repr, "component")
      .select(col("id").as("alias"), col("canonical"))
    // aliases whose key groups were singletons never reach CC — they are
    // their own canonical form
    val all = edges.select(col("src").as("alias")).distinct()
    all.join(mapped, Seq("alias"), "left")
      .select(col("alias"), coalesce(col("canonical"), col("alias")).as("canonical"))
  }
}
