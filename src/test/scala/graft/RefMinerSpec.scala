package graft

import graft.kb._
import graft.mine._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Full-search differential: [[Miner]] (Spark: existential dedup, merged
 * level plans, fused scoring, broadcast hints) vs [[RefMiner]] (naive
 * in-memory backtracking) must emit the IDENTICAL rule set with identical
 * counts — on the reference fixtures and on seeded random KBs whose
 * shapes exercise skyline floors, perfect-rule pruning and hub fan-outs.
 */
class RefMinerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def compare(triples: Seq[(String, String, String)], cfg: MinerConfig): Unit = {
    import spark.implicits._
    val df    = triples.toDF("subj", "pred", "obj")
    val mined = new Miner(df, cfg).mine()
      .map(s => s.rule.canonical -> s).toMap
    val ref = RefMiner.mine(triples, cfg)
      .map(s => s.rule.canonical -> s).toMap
    assert(mined.keySet == ref.keySet,
      s"rule sets differ:\n extra=${(mined.keySet -- ref.keySet).mkString("\n  ")}" +
        s"\n missing=${(ref.keySet -- mined.keySet).mkString("\n  ")}")
    for ((c, m) <- mined; r = ref(c)) {
      assert(m.support == r.support && m.bodySize == r.bodySize &&
        m.pcaBodySize == r.pcaBodySize, s"counts differ for $c: " +
        s"mined(${m.support},${m.bodySize},${m.pcaBodySize}) vs " +
        s"ref(${r.support},${r.bodySize},${r.pcaBodySize})")
      assert(math.abs(m.pcaConfidence - r.pcaConfidence) < 1e-9 &&
        math.abs(m.headCoverage - r.headCoverage) < 1e-9 &&
        math.abs(m.stdConfidence - r.stdConfidence) < 1e-9, s"ratios differ for $c")
    }
  }

  test("depth-3 search matches brute force on the reference fixtures") {
    val base = Fixtures.extendedFacts.map(t => (t.subj, t.pred, t.obj))
    compare(base, MinerConfig(minSupport = 2, minHeadCoverage = 0.1,
      minPcaConfidence = 0.1, maxDepth = 3))
    // tighter thresholds flip which rules the skyline floor suppresses
    compare(base, MinerConfig(minSupport = 2, minHeadCoverage = 0.3,
      minPcaConfidence = 0.5, maxDepth = 3))
  }

  test("depth-3 search matches brute force on seeded random KBs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val nPred = 3 + rnd.nextInt(2)
      val nEnt  = 8 + rnd.nextInt(8)
      val nFact = 40 + rnd.nextInt(40)
      val triples = (0 until nFact).map { _ =>
        (s"e${rnd.nextInt(nEnt)}", s"p${rnd.nextInt(nPred)}", s"e${rnd.nextInt(nEnt)}")
      }.distinct
      compare(triples, MinerConfig(minSupport = 2, minHeadCoverage = 0.05,
        minPcaConfidence = 0.1, maxDepth = 3))
      if (trial % 2 == 0)
        compare(triples, MinerConfig(minSupport = 3, minHeadCoverage = 0.2,
          minPcaConfidence = 0.4, maxDepth = 3))
    }
  }

  test("hub-shaped KB (planted high-confidence chain) matches brute force") {
    // livesIn is near-deterministic from worksAt∧locatedIn; one hub city
    // fans out — the shape the existential-dedup and merged plans target
    val rnd = new scala.util.Random(7)
    val people = (0 until 30).map(i => s"person$i")
    val orgs   = (0 until 6).map(i => s"org$i")
    val cities = Seq("hub", "c1", "c2")
    val works  = people.map(p => (p, "worksAt", orgs(rnd.nextInt(orgs.size))))
    val loc    = orgs.map(o => (o, "locatedIn",
      if (rnd.nextInt(3) == 0) cities(1 + rnd.nextInt(2)) else "hub"))
    val lives  = works.map { case (p, _, o) =>
      val c = loc.find(_._1 == o).get._3
      (p, "livesIn", if (rnd.nextInt(10) == 0) "c2" else c)
    }
    compare((works ++ loc ++ lives).distinct,
      MinerConfig(minSupport = 2, minHeadCoverage = 0.05,
        minPcaConfidence = 0.2, maxDepth = 3))
  }
}
