package graft.mine

import graft.kb.{Atom, Const, Term, Var}

/**
 * Datalog-ish triple/rule string parsing — the Spark port of the
 * reference's public query-string surface:
 *
 *  - triple patterns `?s  <rel>  ?o` / `?s rel "literal"`
 *    (AbstractKB.java:144-156,441-471, tested by TestKBTripleParsing);
 *  - rule strings `body => head` and `head :- body`
 *    (AMIEParser.java:38-54, tested by TestKBRuleParsing).
 *
 * Variables are `?name`; everything else (optionally `<…>`-wrapped) is a
 * constant. Angle brackets are preserved as part of the constant only if
 * present in the source (the reference interns the raw token).
 */
object RuleParser {

  def parseTerm(s: String): Term =
    if (s.startsWith("?")) Var(s.drop(1)) else Const(s)

  /** One atom from three whitespace-separated tokens (trailing '.'
    * tolerated, as in the reference's TSV parsing KB.java:203-269). */
  def parseAtom(s: String): Atom = {
    val toks = s.trim.stripSuffix(".").trim.split("\\s+")
    require(toks.length == 3, s"atom needs 3 terms: '$s'")
    Atom(parseTerm(toks(0)), parseTerm(toks(1)), parseTerm(toks(2)))
  }

  /** A conjunction: atoms are flat token triples (the reference splits
    * the token stream in threes, AbstractKB.java:460-471). */
  def parseAtoms(s: String): List[Atom] = {
    val toks = s.trim.split("\\s+").filter(t => t.nonEmpty && t != ".")
    require(toks.length % 3 == 0, s"atom list length not divisible by 3: '$s'")
    toks.grouped(3).map(g => Atom(parseTerm(g(0)), parseTerm(g(1)), parseTerm(g(2)))).toList
  }

  /** `b1 ∧ … ∧ bn => h`  or  `h :- b1, …, bn` (AMIEParser.java:38-54). */
  def parseRule(s: String): Rule =
    if (s.contains("=>")) {
      val Array(body, head) = s.split("=>").map(_.trim)
      Rule(parseAtom(head), parseAtoms(body))
    } else if (s.contains(":-")) {
      val Array(head, body) = s.split(":-").map(_.trim)
      Rule(parseAtom(head), parseAtoms(body.replace(",", " ")))
    } else {
      Rule(parseAtom(s), Nil) // bare head = seed rule
    }
}
