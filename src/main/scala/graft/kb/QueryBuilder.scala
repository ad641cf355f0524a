package graft.kb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Conjunctive-query → DataFrame compiler.
 *
 * Replaces the reference's recursive index-nested-loop evaluator
 * (kb/src/main/java/amie/data/KB.java:1770-3188: existsBS1,
 * selectDistinct, countDistinct, countProjection…): every atom becomes a
 * filtered projection of the triples table, atoms are folded into
 * equi-joins on shared variable columns, and Catalyst (CBO + AQE)
 * replaces the reference's "most restrictive triple" greedy ordering
 * (KB.java:1631-1645). The whole recursion collapses into ONE declarative
 * plan, so predicate pushdown / join reordering / broadcast selection are
 * free.
 */
object QueryBuilder {

  /**
   * Compile a conjunction of atoms over `triples(subj,pred,obj)` into a
   * DataFrame with one column per variable (non-distinct bindings).
   *
   * - constants become pushed-down filters;
   * - a variable repeated inside one atom becomes an intra-row equality;
   * - [[Atom.DifferentFrom]] / [[Atom.Equals]] pseudo-atoms become
   *   post-join filters (reference KB.java:831-870);
   * - atoms are greedily ordered for connectivity only (avoid accidental
   *   cross joins); cardinality ordering is left to Catalyst.
   */
  def bindings(triples: DataFrame, atoms: Seq[Atom]): DataFrame =
    bindings(triples, atoms, None)

  /**
   * As [[bindings]], with optional KG statistics driving a
   * most-restrictive-first greedy join order (the Spark analog of the
   * reference's "most restrictive triple" selection, KB.java:1631-1645,
   * but System-R-style: cardinality-estimated from per-relation size and
   * distinct-subject/object counts instead of live index probes).
   * Ordering never changes the result set — only the plan shape; without
   * stats the connectivity-only order is used and Catalyst's own
   * strategies do the rest.
   */
  def bindings(triples: DataFrame, atoms: Seq[Atom], stats: Option[KGStats]): DataFrame = {
    require(atoms.nonEmpty, "empty conjunctive query")
    val (pseudo, positive) = atoms.partition(_.isPseudo)
    require(positive.nonEmpty, "query needs at least one positive atom")

    val ordered = stats match {
      case Some(st) => cardinalityOrder(positive, st)
      case None     => connectivityOrder(positive)
    }
    var df = atomDF(triples, ordered.head)
    for (a <- ordered.tail) {
      val right  = atomDF(triples, a)
      val shared = df.columns.intersect(right.columns).toSeq
      df = if (shared.isEmpty) df.crossJoin(right) else df.join(right, shared)
    }
    pseudo.foldLeft(df)((d, a) => d.filter(pseudoFilter(d, a)))
  }

  /** Distinct bindings of `vs` — reference selectDistinct (KB.java:1876-2366). */
  def selectDistinct(triples: DataFrame, vs: Seq[Var], atoms: Seq[Atom]): DataFrame =
    bindings(triples, atoms).select(vs.map(v => col(v.name)): _*).distinct()

  /** #distinct bindings of `vs` — reference countDistinct / countDistinctPairs
    * (KB.java:1860-1862,3064-3105). Exact, per BASELINE.md (no approx). */
  def countDistinctBindings(triples: DataFrame, vs: Seq[Var], atoms: Seq[Atom]): Long = {
    val df = bindings(triples, atoms)
    val c  = if (vs.size == 1) countDistinct(col(vs.head.name))
             else countDistinct(struct(vs.map(v => col(v.name)): _*))
    df.agg(c.as("n")).collect()(0).getLong(0)
  }

  /** One atom → projection of the triples table onto its variables. */
  private def atomDF(triples: DataFrame, a: Atom): DataFrame = {
    var t = triples
    def bind(term: Term, c: String): Option[(String, String)] = term match {
      case Const(v) => t = t.filter(col(c) === lit(v)); None
      case Var(n)   => Some(c -> n)
    }
    val binds = Seq(bind(a.s, "subj"), bind(a.p, "pred"), bind(a.o, "obj")).flatten
    // repeated variable inside the atom → intra-row equality filter
    binds.groupBy(_._2).values.filter(_.size > 1).foreach { g =>
      g.sliding(2).foreach { case Seq((c1, _), (c2, _)) => t = t.filter(col(c1) === col(c2)) }
    }
    val proj = binds.map(_._2).distinct.map { v =>
      col(binds.find(_._2 == v).get._1).as(v)
    }
    t.select(proj: _*)
  }

  private def pseudoFilter(df: DataFrame, a: Atom): Column = {
    def c(t: Term): Column = t match { case Var(n) => df(n); case Const(v) => lit(v) }
    a.p match {
      case Const(Atom.DifferentFrom) => c(a.s) =!= c(a.o)
      case Const(Atom.Equals)        => c(a.s) === c(a.o)
      case other => throw new IllegalArgumentException(s"not a pseudo-atom: $other")
    }
  }

  /**
   * Greedy System-R-style atom ordering: start from the atom with the
   * smallest estimated (constant-filtered) cardinality, then repeatedly
   * append the atom minimizing the estimated join output, preferring
   * connected atoms. Join selectivity per already-bound variable position
   * is 1/distinct-values-at-that-position (independence assumed); a
   * variable-predicate atom (the miner's candidate-relation template)
   * uses whole-KB totals. Matters because Spark's CBO join reorder is
   * off by default and the left-deep fold in [[bindings]] otherwise
   * executes atoms in syntactic order — for counting queries like
   * `head(x,y) ∧ body(z,y) ∧ cand(z,x)` the syntactic order explodes
   * through the weakly-selective body join before the template join
   * shrinks it again.
   */
  private[graft] def cardinalityOrder(atoms: Seq[Atom], st: KGStats): Seq[Atom] = {
    if (atoms.size <= 2) return connectivityOrder(atoms)
    val totalSize = math.max(1L, st.totalFacts).toDouble
    val totalDs   = math.max(1L, st.relations.values.map(_.distinctSubj).sum).toDouble
    val totalDo   = math.max(1L, st.relations.values.map(_.distinctObj).sum).toDouble
    // (size, distinctSubj, distinctObj) with constants folded in
    def relStats(a: Atom): (Double, Double, Double) = a.p match {
      case Const(p) => st.relations.get(p) match {
        case Some(r) => (math.max(1.0, r.size.toDouble),
          math.max(1.0, r.distinctSubj.toDouble), math.max(1.0, r.distinctObj.toDouble))
        case None => (1.0, 1.0, 1.0)
      }
      case _ => (totalSize, totalDs, totalDo)
    }
    def baseEst(a: Atom): Double = {
      val (s, ds, dob) = relStats(a)
      var e = s
      if (a.s.isInstanceOf[Const]) e /= ds
      if (a.o.isInstanceOf[Const]) e /= dob
      math.max(e, 1.0)
    }
    val pending = scala.collection.mutable.ArrayBuffer(atoms: _*)
    val out     = scala.collection.mutable.ArrayBuffer[Atom]()
    val bound   = scala.collection.mutable.Set[String]()
    def take(a: Atom): Unit = {
      pending -= a; out += a; a.vars.foreach(v => bound += v.name)
    }
    take(pending.minBy(baseEst))
    var est = baseEst(out.head)
    while (pending.nonEmpty) {
      val connected = pending.filter(_.vars.exists(v => bound(v.name)))
      val pool      = if (connected.nonEmpty) connected.toSeq else pending.toSeq
      def joinedEst(a: Atom): Double = {
        val (_, ds, dob) = relStats(a)
        var e = est * baseEst(a)
        a.s match { case v: Var if bound(v.name) => e /= ds;  case _ => }
        a.o match { case v: Var if bound(v.name) => e /= dob; case _ => }
        math.max(e, 1.0)
      }
      val pick = pool.minBy(joinedEst)
      est = joinedEst(pick)
      take(pick)
    }
    out.toSeq
  }

  /** Greedy reorder so each atom shares a variable with the prefix when
    * possible — prevents gratuitous cross joins; real join-order choice is
    * Catalyst's (SURVEY.md §4). */
  private def connectivityOrder(atoms: Seq[Atom]): Seq[Atom] = {
    val pending = scala.collection.mutable.ArrayBuffer(atoms: _*)
    val out     = scala.collection.mutable.ArrayBuffer[Atom]()
    val seen    = scala.collection.mutable.Set[String]()
    while (pending.nonEmpty) {
      val i = pending.indexWhere(_.vars.exists(v => seen(v.name))) match {
        case -1 => 0
        case k  => k
      }
      val a = pending.remove(i)
      out += a
      a.vars.foreach(v => seen += v.name)
    }
    out.toSeq
  }
}
