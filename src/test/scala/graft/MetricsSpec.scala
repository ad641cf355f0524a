package graft

import graft.kb._
import graft.mine._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Metric-semantics parity with the reference, on the reference's own
 * 12-fact test KB (B_KBTest.java:14-28) — expected values hand-computed
 * in FIXTURES.md §1.
 */
class MetricsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val x = Var("x"); val y = Var("y"); val t = Var("t"); val c = Var("c")

  // R1: worksAt(x,t) ∧ isLocatedIn(t,c) ⇒ livesIn(x,c)
  val r1 = Rule(
    Atom(x, Const("livesIn"), c),
    List(Atom(x, Const("worksAt"), t), Atom(t, Const("isLocatedIn"), c)))
  // R2: wasBornIn(x,y) ⇒ livesIn(x,y)
  val r2 = Rule(Atom(x, Const("livesIn"), y), List(Atom(x, Const("wasBornIn"), y)))

  test("stats pass: per-relation size / distinct / functionality") {
    val stats = KGStats.compute(Fixtures.baseKB(spark))
    assert(stats.totalFacts == 12)
    val lives = stats.relations("livesIn")
    assert(lives.size == 4 && lives.distinctSubj == 4 && lives.distinctObj == 1)
    assert(lives.functionality == 1.0 && lives.inverseFunctionality == 0.25)
    assert(lives.functionalVarIsSubject)
    val works = stats.relations("worksAt")
    assert(works.size == 4 && works.distinctObj == 2)
    assert(works.inverseFunctionality == 0.5)
    assert(stats.relations("wasBornIn").functionality == 1.0)
    assert(stats.relations("isLocatedIn").size == 1)
  }

  test("R1 on base KB: support 3, HC 0.75, std 1.0, PCA 1.0") {
    val kb = Fixtures.baseKB(spark)
    val m  = new Metrics(kb, KGStats.compute(kb))
    val s  = m.score(r1)
    assert(s.support == 3)
    assert(s.bodySize == 3)
    assert(s.pcaBodySize == 3)
    assert(s.headCoverage == 0.75)
    assert(s.stdConfidence == 1.0)
    assert(s.pcaConfidence == 1.0)
    assert(s.functionalVariable == "?x")
  }

  test("R1 on extended KB: support 3, HC 0.6, std 0.75, PCA 0.75") {
    val kb = Fixtures.extendedKB(spark)
    val m  = new Metrics(kb, KGStats.compute(kb))
    val s  = m.score(r1)
    assert(s.support == 3)
    assert(s.bodySize == 4)
    assert(s.pcaBodySize == 4)
    assert(s.headCoverage == 0.6)
    assert(s.stdConfidence == 0.75)
    assert(s.pcaConfidence == 0.75)
  }

  test("R2 on base KB: support 0, std 0.0, PCA 0.0") {
    val kb = Fixtures.baseKB(spark)
    val m  = new Metrics(kb, KGStats.compute(kb))
    val s  = m.score(r2)
    assert(s.support == 0)
    assert(s.bodySize == 3)
    assert(s.pcaBodySize == 3)
    assert(s.stdConfidence == 0.0)
    assert(s.pcaConfidence == 0.0)
  }

  test("batched scoring equals single scoring") {
    val kb = Fixtures.extendedKB(spark)
    val m  = new Metrics(kb, KGStats.compute(kb))
    val batch = m.scoreAll(Seq(r1, r2))
    assert(batch.map(_.support) == Seq(3, 0))
    assert(batch.map(_.bodySize) == Seq(4, 3))
  }

  test("conjunctive query: selectDistinct and pseudo-atoms") {
    val kb = Fixtures.baseKB(spark)
    // who works somewhere located in Paris?
    val who = QueryBuilder
      .selectDistinct(kb, Seq(x), Seq(Atom(x, Const("worksAt"), t), Atom(t, Const("isLocatedIn"), Const("Paris"))))
      .collect().map(_.getString(0)).toSet
    assert(who == Set("Luis", "Thomas", "Antoine"))
    // differentFrom pseudo-atom: pairs living in the same city, x ≠ y
    val pairs = QueryBuilder.countDistinctBindings(
      kb, Seq(x, y),
      Seq(Atom(x, Const("livesIn"), c), Atom(y, Const("livesIn"), c),
        Atom(x, Const(Atom.DifferentFrom), y)))
    assert(pairs == 12) // 4 Paris residents, ordered pairs minus diagonal
  }
}
