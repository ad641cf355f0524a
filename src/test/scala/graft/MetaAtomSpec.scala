package graft

import graft.kb._
import graft.mine.RuleParser
import org.scalatest.funsuite.AnyFunSuite

/**
 * Inline meta-relation atoms in conjunctive queries — the Spark port of
 * the reference's special-relation branches (KB.java:928-1063,
 * 1246-1286; string names AbstractKB.java:102-133, composite
 * cardinality relations Schema.java:130-196). A meta atom may appear
 * ANYWHERE in the atom list of a query, exactly like the reference's
 * `hasNumberOfValuesGreaterThan(...)` placement freedom.
 *
 * KB under test (hand-computed expectations):
 *   worksAt:  a1→c1, a2→c1, a3→c2, a4→c1, a4→c2, a4→c3
 *   livesIn:  a1→t1, a2→t1, a3→t2
 *   capital:  c1→t1
 */
class MetaAtomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val kb = {
    import spark.implicits._
    Seq(
      ("a1", "worksAt", "c1"), ("a2", "worksAt", "c1"), ("a3", "worksAt", "c2"),
      ("a4", "worksAt", "c1"), ("a4", "worksAt", "c2"), ("a4", "worksAt", "c3"),
      ("a1", "livesIn", "t1"), ("a2", "livesIn", "t1"), ("a3", "livesIn", "t2"),
      ("c1", "capital", "t1")
    ).toDF("subj", "pred", "obj")
  }

  private def distinctSet(q: String, vs: String*): Set[Seq[String]] =
    QueryBuilder.selectDistinct(kb, vs.map(Var(_)), RuleParser.parseAtoms(q))
      .collect().map(r => vs.indices.map(r.getString)).toSet

  test("inline exists: subjects of a relation (KB.java:957-962)") {
    // x works somewhere AND ∃y livesIn(x, y)
    assert(distinctSet("?x worksAt ?c livesIn exists ?x", "x") ==
      Set(Seq("a1"), Seq("a2"), Seq("a3")))
    // variable relation position: relations a1 is a subject of
    assert(distinctSet("?r exists a1", "r") ==
      Set(Seq("worksAt"), Seq("livesIn")))
  }

  test("inline existsInv: objects of a relation (KB.java:963-969)") {
    // companies that are someone's workplace AND a capital subject
    assert(distinctSet("worksAt existsInv ?c ?c capital ?t", "c") ==
      Set(Seq("c1")))
  }

  test("inline ~exists over the subject universe (KB.java:970-981)") {
    // subjects-of-anything with no livesIn fact: a4 (workers only) and c1
    assert(distinctSet("livesIn ~exists ?x", "x") == Set(Seq("a4"), Seq("c1")))
    // joined: workers with no livesIn
    assert(distinctSet("?x worksAt ?c livesIn ~exists ?x", "x") ==
      Set(Seq("a4")))
    // fixed entity, variable relation: relations a4 does NOT have
    assert(distinctSet("?r ~exists a4", "r") ==
      Set(Seq("livesIn"), Seq("capital")))
  }

  test("inline ~existsInv over the object universe (KB.java:982-993)") {
    // objects-of-anything never a worksAt object: towns t1, t2
    assert(distinctSet("worksAt ~existsInv ?o", "o") ==
      Set(Seq("t1"), Seq("t2")))
  }

  test("inline cardinality GreaterThan, incl. the k=0 edge (KB.java:1021-1034)") {
    // workers with > 1 workplace
    assert(distinctSet("?x hasNumberOfValuesGreaterThan1 worksAt", "x") ==
      Set(Seq("a4")))
    // k=0 ⇒ subjects having the relation at all
    assert(distinctSet("?x hasNumberOfValuesGreaterThan0 livesIn", "x") ==
      Set(Seq("a1"), Seq("a2"), Seq("a3")))
    // inline with a second atom: towns of multi-employer workers
    assert(distinctSet(
      "?x livesIn ?t ?x hasNumberOfValuesGreaterThan1 worksAt", "t") ==
      Set.empty[Seq[String]])
    assert(distinctSet(
      "?x livesIn ?t ?x hasNumberOfValuesGreaterThan0 worksAt", "t") ==
      Set(Seq("t1"), Seq("t2")))
  }

  test("inline cardinality Equals, incl. k=0 complement (KB.java:1001-1020)") {
    assert(distinctSet("?x hasNumberOfValuesEquals3 worksAt", "x") ==
      Set(Seq("a4")))
    // k=0 ⇒ subject-universe entities WITHOUT the relation
    assert(distinctSet("?x hasNumberOfValuesEquals0 livesIn", "x") ==
      Set(Seq("a4"), Seq("c1")))
  }

  test("inline cardinality SmallerThan counts absent entities as 0 (KB.java:1036-1054)") {
    // subject-universe entities with < 2 workplaces: a1, a2, a3 (1 each)
    // and c1 (0 — in the universe via capital)
    assert(distinctSet("?x hasNumberOfValuesSmallerThan2 worksAt", "x") ==
      Set(Seq("a1"), Seq("a2"), Seq("a3"), Seq("c1")))
    // inverse direction: objects with < 2 distinct workers
    assert(distinctSet("?c hasNumberOfValuesSmallerThanInv2 worksAt", "c") ==
      Set(Seq("c3"), Seq("t1"), Seq("t2")))
  }

  test("cardinality object position must be a constant relation (KB.java:996-999)") {
    intercept[UnsupportedOperationException] {
      QueryBuilder.bindings(kb,
        RuleParser.parseAtoms("?x hasNumberOfValuesGreaterThan1 ?r")).collect()
    }
  }

  test("fully-ground meta atom acts as an existence gate") {
    // TRUE gate: does not change the other atom's bindings
    assert(distinctSet("?x livesIn ?t a4 hasNumberOfValuesGreaterThan2 worksAt",
      "x") == Set(Seq("a1"), Seq("a2"), Seq("a3")))
    // FALSE gate: empties the query
    assert(distinctSet("?x livesIn ?t a1 hasNumberOfValuesGreaterThan2 worksAt",
      "x") == Set.empty[Seq[String]])
  }

  // ---- inline transitiveType (KB.java:929-944,1207-1230) ----
  // schema-annotated KB: Engineer ⊑ Staff ⊑ Person; a1 typed Engineer,
  // a2 typed Staff, a3 typed Visitor; worksAt a1→c1, a2→c1, a3→c2
  private lazy val typedKb = {
    import spark.implicits._
    Seq(
      ("a1", "rdf:type", "Engineer"), ("a2", "rdf:type", "Staff"),
      ("a3", "rdf:type", "Visitor"),
      ("Engineer", "rdfs:subClassOf", "Staff"),
      ("Staff", "rdfs:subClassOf", "Person"),
      ("a1", "worksAt", "c1"), ("a2", "worksAt", "c1"), ("a3", "worksAt", "c2")
    ).toDF("subj", "pred", "obj")
  }
  private def typedSet(q: String, vs: String*): Set[Seq[String]] =
    QueryBuilder.selectDistinct(typedKb, vs.map(Var(_)), RuleParser.parseAtoms(q))
      .collect().map(r => vs.indices.map(r.getString)).toSet

  test("inline transitiveType, class constant: direct + subclass instances") {
    // Staff: a2 direct, a1 via Engineer ⊑ Staff (direct instances INCLUDED
    // — the consistent entailment semantics; see QueryBuilder divergence note)
    assert(typedSet("?x transitiveType Staff", "x") == Set(Seq("a1"), Seq("a2")))
    assert(typedSet("?x transitiveType Person", "x") == Set(Seq("a1"), Seq("a2")))
    assert(typedSet("?x transitiveType Visitor", "x") == Set(Seq("a3")))
    assert(typedSet("?x transitiveType Nothing", "x") == Set.empty[Seq[String]])
  }

  test("inline transitiveType, entity constant: all entailed classes (Schema.java:518-525)") {
    assert(typedSet("a1 transitiveType ?c", "c") ==
      Set(Seq("Engineer"), Seq("Staff"), Seq("Person")))
    assert(typedSet("a3 transitiveType ?c", "c") == Set(Seq("Visitor")))
  }

  test("inline transitiveType, both variables: the full entailed pair table (KB.java:1211-1216)") {
    assert(typedSet("?x transitiveType ?c", "x", "c") == Set(
      Seq("a1", "Engineer"), Seq("a1", "Staff"), Seq("a1", "Person"),
      Seq("a2", "Staff"), Seq("a2", "Person"), Seq("a3", "Visitor")))
  }

  test("inline transitiveType composes inside a conjunction at any position") {
    // companies employing someone entailed-typed Staff
    assert(typedSet("?x worksAt ?c ?x transitiveType Staff", "c") ==
      Set(Seq("c1")))
    // meta atom FIRST — placement freedom
    assert(typedSet("?x transitiveType Person ?x worksAt ?c", "c") ==
      Set(Seq("c1")))
    // fully-ground: TRUE gate keeps bindings, FALSE gate empties
    assert(typedSet("?x worksAt ?c a1 transitiveType Person", "c") ==
      Set(Seq("c1"), Seq("c2")))
    assert(typedSet("?x worksAt ?c a3 transitiveType Person", "c") ==
      Set.empty[Seq[String]])
  }

  test("meta atoms compose with pseudo-atoms and constants") {
    // pairs of colleagues at a company with a capital fact, distinct people
    val got = distinctSet(
      "?x worksAt ?c ?y worksAt ?c capital existsInv ?t ?c capital ?t " +
        "?x differentFrom ?y", "x", "y")
    assert(got == Set(Seq("a1", "a2"), Seq("a2", "a1"), Seq("a1", "a4"),
      Seq("a4", "a1"), Seq("a2", "a4"), Seq("a4", "a2")))
  }
}
