package graft.mine

import graft.kb._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * AMIE rule-quality metrics, computed with Catalyst joins + exact
 * countDistinct — the bit-for-bit contract of SURVEY.md §2.10:
 *
 * - support        = #distinct head-var bindings of (head ∧ body)
 *                    (DefaultMiningAssistant.java:636-655)
 * - headCoverage   = support / headSize (MiningAssistant.java:493-511)
 * - stdConfidence  = support / #distinct head-var bindings of (body)
 *                    (DMA:699-726, Rule.java:513-515)
 * - pcaConfidence  = support / #bindings of (body ∧ r(x, y′)) where the
 *                    NON-functional head variable is replaced by a fresh
 *                    existential (DMA:658-696, MA:1415-1445); functional
 *                    variable = subject iff functionality ≥ inverse
 *                    functionality (MA:722-729, KB.java:717-720).
 *
 * All rules of a generation are scored in ONE Spark job: per-rule
 * single-row aggregates are unioned and collected together, so the
 * per-candidate query storm of the reference (one KB call per rule)
 * becomes a handful of jobs per BFS level.
 */
final class Metrics(triples: DataFrame, stats: KGStats) {

  private def freshVar(r: Rule): Var = {
    val used = r.allVars.map(_.name).toSet
    Var(Iterator.from(0).map(i => s"pca$i").find(!used(_)).get)
  }

  /** The PCA body: body ∧ head-with-nonfunctional-var-replaced. */
  def pcaAtoms(r: Rule): Seq[Atom] = {
    val fresh = freshVar(r)
    val pcaHead =
      if (headRelationFunctionalIsSubject(r)) r.head.copy(o = fresh)
      else r.head.copy(s = fresh)
    r.body :+ pcaHead
  }

  def headRelationFunctionalIsSubject(r: Rule): Boolean = r.head.p match {
    case Const(p) => stats.functionalVarIsSubject(p)
    case _        => true
  }

  /** Count-distinct of the rule's head variables over a conjunction,
    * as a 1-row DataFrame tagged with (rule_id, kind). */
  private def agg1(ruleId: Int, kind: String, vs: Seq[Var], atoms: Seq[Atom]): DataFrame = {
    val df = QueryBuilder.bindings(triples, atoms)
    val c =
      if (vs.size == 1) countDistinct(col(vs.head.name))
      else countDistinct(struct(vs.map(v => col(v.name)): _*))
    df.agg(c.as("n")).select(lit(ruleId).as("rule_id"), lit(kind).as("kind"), col("n"))
  }

  /** Head size: relation size for a 2-variable head (stats lookup — no
    * job); a count query when the head carries a constant. */
  private def headSize(r: Rule): Long = r.head match {
    case Atom(_: Var, Const(p), _: Var) => stats.size(p)
    case _ =>
      QueryBuilder.countDistinctBindings(triples, r.headVars, Seq(r.head))
  }

  import Metrics.JobChunk

  /** Score a batch of closed rules in a handful of chunked jobs. */
  def scoreAll(rules: Seq[Rule]): Seq[ScoredRule] = {
    if (rules.isEmpty) return Nil
    val parts = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(
        agg1(i, "support", r.headVars, r.atoms),
        agg1(i, "body", r.headVars, r.body),
        agg1(i, "pca", r.headVars, pcaAtoms(r)))
    }
    val all = parts.grouped(JobChunk).toSeq
      .flatMap(chunk => chunk.reduce(_ union _).collect())
    val byRule = all.groupBy(_.getInt(0)).map { case (i, rows) =>
      i -> rows.map(row => row.getString(1) -> row.getLong(2)).toMap
    }
    rules.zipWithIndex.map { case (r, i) =>
      val m       = byRule(i)
      val support = m.getOrElse("support", 0L)
      val body    = m.getOrElse("body", 0L)
      val pca     = m.getOrElse("pca", 0L)
      val hs      = headSize(r)
      ScoredRule(
        rule = r,
        support = support,
        headCoverage = if (hs == 0) 0.0 else support.toDouble / hs,
        stdConfidence = if (body == 0) 0.0 else support.toDouble / body,
        pcaConfidence = if (pca == 0) 0.0 else support.toDouble / pca,
        bodySize = body,
        pcaBodySize = pca,
        functionalVariable = {
          val t = if (headRelationFunctionalIsSubject(r)) r.head.s else r.head.o
          t match { case Var(n) => s"?$n"; case Const(c) => c } // head may be instantiated
        })
    }
  }

  def score(rule: Rule): ScoredRule = scoreAll(Seq(rule)).head

  /** Support alone (computeCardinality, DMA:636-655). */
  def support(r: Rule): Long =
    QueryBuilder.countDistinctBindings(triples, r.headVars, r.atoms)
}

object Metrics {
  /** Max single-row aggregate plans unioned into one Spark job. Catalyst
    * planning cost grows superlinearly with union width; chunking keeps
    * each job's plan bounded while still batching dozens of measurements
    * per job (vs the reference's one KB call per rule). */
  val JobChunk = 24
}
