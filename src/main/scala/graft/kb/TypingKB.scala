package graft.kb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reduced typing KB — Spark re-expression of the reference's
 * SimpleTypingKB (kb/src/main/java/amie/data/SimpleTypingKB.java:18-57),
 * the per-relation/per-class ENTITY-SET view used by schema/typing
 * mining:
 *
 *  - `rdf:type` facts collapse to class → subject sets;
 *  - every other relation collapses to its subject set (`r`) and its
 *    object set (`r-1`) — the reference's synthetic inverse key;
 *  - `rdfs:subClassOf` facts are kept as triples (the taxonomy walks
 *    them, not set algebra).
 *
 * The reference holds these as in-memory IntSets and intersects them
 * with SetU.countIntersection; here a "set" is a distinct DataFrame, so
 * set size is an aggregation and |A ∩ B| over all pairs is ONE join +
 * groupBy — the shape that scales to 10¹²-entity KBs where no set fits
 * one machine.
 */
final case class TypingKB(
    /** (cls, entity) — distinct. */
    classes: DataFrame,
    /** (rel, entity) — distinct; object sets appear under `rel-1`. */
    relations: DataFrame,
    /** (subj, pred, obj) subClassOf triples, unchanged. */
    subClassOf: DataFrame)

object TypingKB {

  def fromTriples(
      triples: DataFrame,
      typeRelation: String = "rdf:type",
      subClassRelation: String = "rdfs:subClassOf"): TypingKB = {
    val classes = triples.where(col("pred") === typeRelation)
      .select(col("obj").as("cls"), col("subj").as("entity")).distinct()
    val rels = triples.where(col("pred") =!= typeRelation &&
      col("pred") =!= subClassRelation)
    val relations = rels
      .select(col("pred").as("rel"), col("subj").as("entity"))
      .union(rels.select(concat(col("pred"), lit("-1")).as("rel"),
        col("obj").as("entity")))
      .distinct()
    TypingKB(classes, relations,
      triples.where(col("pred") === subClassRelation))
  }

  /** cls → |entities| (the reference's classes.get(c).size()). */
  def classSizes(t: TypingKB): DataFrame =
    t.classes.groupBy("cls").agg(count(lit(1)).as("size"))

  /** rel → |entities| for both `r` and `r-1` rows. */
  def relationSizes(t: TypingKB): DataFrame =
    t.relations.groupBy("rel").agg(count(lit(1)).as("size"))

  /** |entities(cls) ∩ entities(rel)| for every (class, relation) pair
    * with a non-empty intersection — the typing miner's core probe
    * (SetU.countIntersection over classes × relation domains). One
    * shuffle on the entity. */
  def classRelationOverlap(t: TypingKB): DataFrame =
    t.classes.join(t.relations, "entity")
      .groupBy("cls", "rel").agg(count(lit(1)).as("overlap"))
}
