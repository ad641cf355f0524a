package graft

import graft.mine._
import graft.kb.{Atom, Const, Var}
import graft.pipeline.{Corpus, Pipeline}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Full north-star path: interleaved docs → KG construction → AMIE-style
  * rule mining over the constructed graph. The corpus plants
  * `worksAt(x,t) ∧ isLocatedIn(t,c) ⇒ livesIn(x,c)` by entity-level
  * construction (Corpus.orgOf/cityOf), so the miner must recover it with
  * PCA confidence exactly 1.0; the noise relations must not yield
  * high-confidence rules. */
class E2ESpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("mining the constructed graph recovers the planted rule at PCA 1.0") {
    val dir  = Files.createTempDirectory("graft-e2e").toString
    val p    = new Pipeline(spark, dir, nBuckets = 4)
    // V=200 keeps the noise relations sparse (random pairs over 200²)
    // while the planted structure stays functional and dense
    p.run(Corpus.generate(spark, 3000, 200), inputFp = Some("e2e:3000:200"))
    val triples = p.triples()

    val rules = new Miner(triples,
      MinerConfig(minSupport = 10, minHeadCoverage = 0.05, minPcaConfidence = 0.5)).mine()

    val planted = rules.find { s =>
      s.rule.head.p == Const("livesIn") &&
        s.rule.body.map(_.p).toSet == Set(Const("worksAt"), Const("isLocatedIn"))
    }
    assert(planted.isDefined, s"planted rule not mined; got:\n${rules.map(_.rule).mkString("\n")}")
    assert(planted.get.pcaConfidence == 1.0)
    assert(planted.get.support >= 10)

    // the noise head (wasBornIn is uniform random) must not surface a
    // high-std-confidence 2-hop rule
    val noisy = rules.filter(s =>
      s.rule.head.p == Const("wasBornIn") && s.stdConfidence > 0.5)
    assert(noisy.isEmpty, s"noise rules over-confident: $noisy")
  }

  test("planted-rule metrics agree with direct SQL on the constructed graph") {
    val dir = Files.createTempDirectory("graft-e2e2").toString
    val p   = new Pipeline(spark, dir, nBuckets = 4)
    p.run(Corpus.generate(spark, 1500, 50), inputFp = Some("e2e:1500:50"))
    val triples = p.triples().cache()
    triples.createOrReplaceTempView("t")

    val m  = new Metrics(triples, graft.kb.KGStats.compute(triples))
    val sc = m.score(Rule(
      Atom(Var("x"), Const("livesIn"), Var("c")),
      List(Atom(Var("x"), Const("worksAt"), Var("t")),
        Atom(Var("t"), Const("isLocatedIn"), Var("c")))))

    val sql = spark.sql(
      """SELECT
        |  (SELECT count(*) FROM (
        |     SELECT DISTINCT a.subj, b.obj FROM t a
        |     JOIN t b ON a.obj = b.subj
        |     JOIN t h ON h.subj = a.subj AND h.obj = b.obj
        |     WHERE a.pred='worksAt' AND b.pred='isLocatedIn' AND h.pred='livesIn')) AS support,
        |  (SELECT count(*) FROM (
        |     SELECT DISTINCT a.subj, b.obj FROM t a
        |     JOIN t b ON a.obj = b.subj
        |     WHERE a.pred='worksAt' AND b.pred='isLocatedIn')) AS body_size
        |""".stripMargin).collect()(0)
    assert(sc.support == sql.getLong(0))
    assert(sc.bodySize == sql.getLong(1))
  }
}
