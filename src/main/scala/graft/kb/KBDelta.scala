package graft.kb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Batch append/retract over the immutable triples table — the engine's
 * answer to the reference's in-place delete with six-way index
 * maintenance (kb/src/main/java/amie/data/KB.java:4090-4127). A Spark
 * KB is a snapshot, so a delta produces a NEW table:
 *
 *   kb' = (kb ∖ deletions) ∪ additions     (set semantics, like the
 *                                           reference's dedup-on-add)
 *
 * — one anti-join plus a union-distinct, both shuffling only on the
 * triple key. Statistics refresh is incremental: only relations touched
 * by the delta are recounted (distinct-subject/object counts are not
 * algebraically maintainable under deletes without per-key multiplicity
 * state, but they ARE per-relation local — at 100 TB a delta recounts a
 * handful of relation partitions, never the full table).
 */
object KBDelta {

  private val key = Seq("subj", "pred", "obj")

  def apply(kb: DataFrame, additions: DataFrame, deletions: DataFrame): DataFrame =
    kb.select(key.map(col): _*)
      .join(deletions.select(key.map(col): _*), key, "left_anti")
      .union(additions.select(key.map(col): _*))
      .distinct()

  /**
   * Refresh per-relation stats after a delta: relations named by the
   * delta are recomputed over the new KB; untouched relations keep
   * their rows from `old`. Exact — spec'd equal to a full recompute.
   */
  def refreshStats(
      old: KGStats,
      newKb: DataFrame,
      additions: DataFrame,
      deletions: DataFrame): KGStats = {
    val touched = additions.select("pred").union(deletions.select("pred"))
      .distinct().collect().map(_.getString(0)).toSet
    if (touched.isEmpty) return old
    val recomputed =
      KGStats.compute(newKb.where(col("pred").isin(touched.toSeq: _*)))
    val merged = old.relations.filterNot { case (p, _) => touched(p) } ++
      recomputed.relations
    KGStats(merged, merged.values.map(_.size).sum)
  }
}
