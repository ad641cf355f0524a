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

  /** Head variables in (subject, object) position order. */
  def headVars: Seq[Var] = head.vars.distinct

  def length: Int = atoms.size

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
    def render(bodyPerm: List[Atom]): String = {
      val ren = scala.collection.mutable.LinkedHashMap[String, String]()
      def t(x: Term): String = x match {
        case Const(v) => v
        case Var(n)   => ren.getOrElseUpdate(n, s"?v${ren.size}")
      }
      (head :: bodyPerm).map(a => s"${t(a.p)}(${t(a.s)},${t(a.o)})").mkString(" ")
    }
    body.permutations.map(render).min
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

  /** Deterministic AMIE-style rule string: body atoms sorted by
    * (pred, obj, subj) then ` => ` head (Rule.java:1186-1236). */
  def amieString: String = {
    def t(x: Term): String = x match { case Var(n) => s"?$n"; case Const(v) => v }
    def atomStr(a: Atom) = s"${t(a.s)}  ${t(a.p)}  ${t(a.o)}"
    val sorted = body.sortBy(a => (t(a.p), t(a.o), t(a.s)))
    sorted.map(atomStr).mkString("", "   ", s"   => ${atomStr(head)}")
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
    functionalVariable: String)
