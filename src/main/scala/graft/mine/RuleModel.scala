package graft.mine

import graft.kb.{Atom, Const, Term, Var}

/**
 * Horn rule `body ⇒ head` — driver-side object, mirroring the reference's
 * rule model (rules/src/main/java/amie/rules/Rule.java:41-161) minus the
 * int encoding: terms are strings, and equivalence uses an exact
 * canonical form instead of backtracking homomorphism
 * (rules/.../QueryEquivalenceChecker.java:20-74) — for rules of ≤ 4 atoms
 * the lexicographically-minimal variable-renamed atom permutation is an
 * exact canonical representative.
 */
final case class Rule(head: Atom, body: List[Atom]) {
  def atoms: List[Atom] = head :: body

  /** Body atoms that scan data (pseudo-atoms are filters). */
  def realBody: List[Atom] = body.filterNot(_.isPseudo)

  /** Head variables in (subject, object) position order. */
  def headVars: Seq[Var] = head.vars.distinct

  /** Rule length counts REAL atoms only (Rule.getRealLength) — pseudo
    * guards like differentFrom must not consume maxDepth budget, or a
    * guarded child becomes unrefinable one level early. */
  def length: Int = 1 + realBody.size

  /** Closed-rule language bias (Rule.java:921-935): every variable appears
    * in at least two non-pseudo atoms. */
  def isClosed: Boolean = {
    val real = atoms.filterNot(_.isPseudo)
    val counts = real.flatMap(_.vars.distinct).groupBy(_.name).map { case (k, v) => k -> v.size }
    counts.values.forall(_ >= 2)
  }

  /** Variables appearing in exactly one non-pseudo atom ("open"/dangling). */
  def openVars: Seq[Var] = {
    val real = atoms.filterNot(_.isPseudo)
    val counts = real.flatMap(_.vars.distinct).groupBy(_.name)
    counts.collect { case (_, vs) if vs.size == 1 => vs.head }.toSeq
  }

  def allVars: Seq[Var] = atoms.flatMap(_.vars).distinct

  /** #occurrences of a relation among the atoms — the recursivity-limit
    * guard (DefaultMiningAssistant.java:212-214). */
  def relationOccurrences(rel: String): Int =
    atoms.count(_.p == Const(rel))

  /**
   * Canonical form: for every permutation of the body, rename variables in
   * first-appearance order (head first, so head var roles are fixed) and
   * take the lexicographic minimum. Exact equivalence for permutation +
   * renaming — the cases the reference's checker handles
   * (TestEquivalenceChecker.java:243-283).
   */
  lazy val canonical: String = {
    def atomStr(a: Atom, t: Term => String) = s"${t(a.p)}(${t(a.s)},${t(a.o)})"
    def render(bodyPerm: List[Atom], pseudoTail: List[Atom]): String = {
      val ren = scala.collection.mutable.LinkedHashMap[String, String]()
      def t(x: Term): String = x match {
        case Const(v) => v
        case Var(n)   => ren.getOrElseUpdate(n, s"?v${ren.size}")
      }
      val main = (head :: bodyPerm).map(atomStr(_, t)).mkString(" ")
      if (pseudoTail.isEmpty) main
      else main + " | " + pseudoTail.map(atomStr(_, t)).sorted.mkString(" ")
    }
    // pseudo-atoms are order-independent filters: rename from the real
    // permutation, then sort their renderings — this keeps the permutation
    // count at realBody! instead of body! (guards would otherwise blow it
    // up factorially). Only valid when every pseudo variable is bound by a
    // real atom (always true for miner-generated rules); otherwise fall
    // back to permuting everything.
    val pseudo = body.filter(_.isPseudo)
    val realVars = (head :: realBody).flatMap(_.vars).toSet
    if (pseudo.forall(_.vars.forall(realVars)))
      realBody.permutations.map(render(_, pseudo)).min
    else
      body.permutations.map(render(_, Nil)).min
  }

  override def toString: String = {
    val b = body.map(_.toString).mkString(" ∧ ")
    s"$b ⇒ $head"
  }

  /** Datalog rendering `h(s,o) <= b1(s,o), b2(s,o)` with angle brackets
    * stripped and pseudo-atoms dropped (Rule.getDatalogString /
    * toDatalog, reference rules/.../Rule.java:1359-1383). */
  def datalogString: String = {
    def t(x: Term): String = x match {
      case Var(n)   => s"?$n"
      case Const(v) => v.replace("<", "").replace(">", "")
    }
    def atom(a: Atom) = s"${t(a.p)}(${t(a.s)},${t(a.o)})"
    val bodyStr = body.filterNot(_.isPseudo).map(atom).mkString(", ")
    s"${atom(head)} <= $bodyStr"
  }

  /** AnyBURL rendering: head variables become X/Y, remaining variables
    * A, B, … in order of appearance (AnyBurlFormatter.java:20-45).
    * Renaming replaces whole `?var` tokens in one regex pass — sequential
    * String.replace would corrupt rules where one variable name prefixes
    * another (?z1 vs ?z10). */
  def anyBurlString: String = {
    val s = datalogString
    val rename = scala.collection.mutable.LinkedHashMap[String, String]()
    head.vars.map(v => s"?${v.name}").zip(Seq("X", "Y"))
      .foreach { case (v, r) => rename(v) = r }
    var next = 'A'
    val varToken = "\\?[A-Za-z0-9]+".r
    varToken.findAllIn(s).foreach { v =>
      if (!rename.contains(v)) { rename(v) = next.toString; next = (next + 1).toChar }
    }
    varToken.replaceAllIn(s, m => rename(m.matched))
  }

  /** Reverse-datalog rendering (Rule.getReverseDatalogRuleString,
    * rules/.../Rule.java:1238-1266; ReverseDatalogLikeRuleFormatter.java):
    * body atoms in sortBody (pred, obj, subj) order as `p(s,o)`,
    * differentFrom pseudo-atoms as `s!=o`, then ` => h(s,o)`. */
  def reverseDatalogString: String = {
    def t(x: Term): String = x match { case Var(n) => s"?$n"; case Const(v) => v }
    def atomStr(a: Atom) =
      if (a.p == Const(Atom.DifferentFrom)) s"${t(a.s)}!=${t(a.o)}"
      else s"${t(a.p)}(${t(a.s)},${t(a.o)})"
    val sorted = body.sortBy(a => (t(a.p), t(a.o), t(a.s)))
    sorted.map(atomStr).mkString("", " ", s"  => ${atomStr(head)}")
  }

  /** Deterministic AMIE-style rule string: body atoms sorted by
    * (pred, obj, subj) then ` => ` head (Rule.java:1186-1236). */
  def amieString: String = {
    def t(x: Term): String = x match { case Var(n) => s"?$n"; case Const(v) => v }
    def atomStr(a: Atom) = s"${t(a.s)}  ${t(a.p)}  ${t(a.o)}"
    val sorted = body.sortBy(a => (t(a.p), t(a.o), t(a.s)))
    sorted.map(atomStr).mkString("", "   ", s"   => ${atomStr(head)}")
  }
}

object Rule {

  /** TRUE iff two atoms unify positionally: a variable unifies with
    * anything, constants must match (Rule.isUnifiable,
    * rules/.../Rule.java:686-718, both directions folded in). */
  def unifiable(a: Atom, b: Atom): Boolean = {
    def u(x: Term, y: Term): Boolean = (x, y) match {
      case (_: Var, _) | (_, _: Var) => true
      case (Const(c1), Const(c2))    => c1 == c2
    }
    u(a.s, b.s) && u(a.p, b.p) && u(a.o, b.o)
  }

  /**
   * Rule equivalence by backtracking unification — the reference's
   * QueryEquivalenceChecker.areEquivalent (QueryEquivalenceChecker.java:
   * 20-74): an injective variable mapping and an atom bijection taking
   * head to head. Equivalent in power to [[Rule.canonical]] equality.
   * Public pairwise API (the reference exposes its checker the same way);
   * the BFS dedup keeps using `canonical` because a set membership test
   * needs a hashable key, and with pseudo-atoms factored out its
   * permutation count is bounded by the real body length (≤ maxDepth−1).
   */
  def equivalent(r1: Rule, r2: Rule): Boolean = {
    // body sizes must match exactly (incl. pseudo-atoms): the bijection
    // below walks r1's atoms, so without this a rule would compare
    // equivalent to itself-plus-an-extra-guard
    if (r1.length != r2.length || r1.body.size != r2.body.size) return false

    // substitution state: var-of-r1 → var-of-r2, injective
    def unify(a1: Atom, a2: Atom, m: Map[String, String], used: Set[String])
        : Option[(Map[String, String], Set[String])] = {
      def step(t1: Term, t2: Term, st: (Map[String, String], Set[String]))
          : Option[(Map[String, String], Set[String])] = (t1, t2) match {
        case (Var(v1), Var(v2)) =>
          val (mm, uu) = st
          mm.get(v1) match {
            case Some(x) => if (x == v2) Some(st) else None
            case None    => if (uu(v2)) None else Some((mm + (v1 -> v2), uu + v2))
          }
        case (Const(c1), Const(c2)) if c1 == c2 => Some(st)
        case _                                  => None
      }
      step(a1.s, a2.s, (m, used))
        .flatMap(step(a1.p, a2.p, _))
        .flatMap(step(a1.o, a2.o, _))
    }

    def bodies(i: Int, remaining2: List[Atom], m: Map[String, String], used: Set[String]): Boolean =
      if (i >= r1.body.size) true
      else remaining2.exists { a2 =>
        unify(r1.body(i), a2, m, used).exists { case (mm, uu) =>
          bodies(i + 1, remaining2.filterNot(_ eq a2), mm, uu)
        }
      }

    unify(r1.head, r2.head, Map.empty, Set.empty)
      .exists { case (m, u) => bodies(0, r2.body, m, u) }
  }
}

/** A rule with its quality metrics — the output row of the miner
  * (column contract: FIXTURES.md §4 / rules/.../RuleFormatter.java:19-27). */
final case class ScoredRule(
    rule: Rule,
    support: Long,
    headCoverage: Double,
    stdConfidence: Double,
    pcaConfidence: Double,
    bodySize: Long,
    pcaBodySize: Long,
    functionalVariable: String,
    /** support / kb.size() (Rule.java:58-60, set at DMA:231). */
    supportRatio: Double = 0.0,
    /** Type-I-shape confidence bounds + functionality-heuristic PCA
      * estimate (OutputColumn.java:5-8). 0.0 when not computed — the
      * reference's field defaults (Rule.java:241-242); they are only
      * populated when the corresponding pruning pass ran. */
    stdConfUpperBound: Double = 0.0,
    pcaConfUpperBound: Double = 0.0,
    pcaConfEstimation: Double = 0.0)
