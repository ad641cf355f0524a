package graft.mine

import graft.kb.{Const, Var}

/**
 * The assistant-variant extension surface — the Spark re-expression of the
 * reference's mining-assistant factory
 * (mining/src/main/java/amie/mining/assistant/MiningAssistantFactory.java:33-90,
 * bias names `oneVar|default|signatured|lazy|lazit`,
 * mining/.../utils/AMIEOptions.java:185-189). A bias changes HOW counts are
 * computed, never the rule algebra: the BFS, operators and thresholds live
 * in [[Miner]]; a bias supplies the counting variables and the denominator
 * strategy.
 */
sealed trait MiningBias {

  /** Variables whose distinct bindings define support and the confidence
    * denominators for a rule. */
  def countVars(metrics: Metrics, r: Rule): Seq[Var]

  /** Early-stop denominators (`lazy`/`lazit` biases,
    * LazyMiningAssistant.java:40-88): bound the std/PCA denominator count
    * at `ceil(support/minConf)+1` — a truncated count can only push the
    * confidence below the threshold, so the emitted rule set is identical
    * to the default bias with exact metrics (output invariance is spec'd). */
  def lazyDenominators: Boolean = false

  /** Relations a bias bans from heads and bodies (the `signatured` bias
    * excludes the schema relations themselves,
    * RelationSignatureDefaultMiningAssistant.java:29-33). */
  def excludedRelations: Set[String] = Set.empty

  /** Extra atoms appended to a closed rule before scoring/output (the
    * `signatured` bias adds `type(x, domain(rh))` / `type(y, range(rh))`,
    * RelationSignatureDefaultMiningAssistant.java:49-86). Default: none. */
  def typeConstraints(r: Rule): List[graft.kb.Atom] = Nil
}

object MiningBias {

  /** DefaultMiningAssistant: support = #distinct bindings of BOTH head
    * variables (DMA:636-655). */
  case object Default extends MiningBias {
    def countVars(metrics: Metrics, r: Rule): Seq[Var] = r.headVars
  }

  /** The base MiningAssistant (`oneVar`): support counts the FUNCTIONAL
    * head variable only (MiningAssistant.java:1394-1404 — countDistinct on
    * `rule.getFunctionalVariable()`). */
  case object OneVar extends MiningBias {
    def countVars(metrics: Metrics, r: Rule): Seq[Var] = {
      val t = if (metrics.headRelationFunctionalIsSubject(r)) r.head.s else r.head.o
      t match {
        case v: Var => Seq(v)
        case _      => r.headVars // instantiated functional position
      }
    }
  }

  /** LazyMiningAssistant: default counting variables, early-stop
    * denominators. */
  case object Lazy extends MiningBias {
    def countVars(metrics: Metrics, r: Rule): Seq[Var] = r.headVars
    override def lazyDenominators: Boolean = true
  }

  /**
   * RelationSignatureDefaultMiningAssistant: enforce the head relation's
   * rdfs:domain/rdfs:range on the head variables — closed rules are scored
   * (and emitted) with `type(x, domain(rh))` / `type(y, range(rh))` atoms
   * appended to the body
   * (RelationSignatureDefaultMiningAssistant.java:49-103; domain/range
   * lookup Schema.java:415-458), and the schema relations themselves are
   * banned from rules (:29-33).
   *
   * `domains`/`ranges` map relation → class (built by
   * [[graft.kb.Taxonomy.relationSignatures]] from rdfs:domain/rdfs:range
   * facts); relations without a declared signature add no constraint.
   */
  final case class Signatured(
      domains: Map[String, String],
      ranges: Map[String, String],
      typeRelation: String = "rdf:type") extends MiningBias {

    def countVars(metrics: Metrics, r: Rule): Seq[Var] = r.headVars

    override val excludedRelations: Set[String] =
      Set(typeRelation, "rdfs:domain", "rdfs:range")

    override def typeConstraints(r: Rule): List[graft.kb.Atom] = {
      val headRel = r.head.p match { case Const(p) => p; case _ => return Nil }
      val dom = (r.head.s, domains.get(headRel)) match {
        case (v: Var, Some(cls)) =>
          List(graft.kb.Atom(v, Const(typeRelation), Const(cls)))
        case _ => Nil
      }
      val rng = (r.head.o, ranges.get(headRel)) match {
        case (v: Var, Some(cls)) =>
          List(graft.kb.Atom(v, Const(typeRelation), Const(cls)))
        case _ => Nil
      }
      dom ++ rng
    }
  }
}
