package graft

import graft.kb._
import graft.mine._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Randomized differential testing: the Catalyst query compiler and the
 * AMIE metric layer are checked against a brute-force in-memory
 * evaluator on random small KBs and random rule shapes. Deterministic
 * seeds (no flakes); the pure-driver properties run hundreds of cases,
 * the Spark-job properties a dozen (each costs a few jobs).
 *
 * The brute-force evaluator enumerates ALL satisfying assignments of a
 * conjunction — an independent implementation of the semantics the
 * reference defines recursively (KB.java:1770-3188) and this engine
 * compiles to joins, so agreement on random inputs is evidence both got
 * it right, not that they share a bug.
 */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ---------- brute-force evaluator ----------

  // the evaluator lives in [[BruteForce]] (shared with BruteMinerSpec)
  private def bruteBindings(
      kb: Set[(String, String, String)], atoms: Seq[Atom]): Set[Map[String, String]] =
    BruteForce.bindings(kb, atoms)

  private def bruteCountDistinct(
      kb: Set[(String, String, String)], vs: Seq[Var], atoms: Seq[Atom]): Long =
    BruteForce.countDistinct(kb, vs, atoms)

  /** Brute-force ScoredRule mirroring Metrics' documented semantics. */
  private def bruteScore(kb: Set[(String, String, String)], r: Rule): (Long, Long, Long, Long) =
    BruteForce.score(kb, r)

  // ---------- random generators (deterministic seed) ----------

  private def randomKB(rng: scala.util.Random, nFacts: Int): Set[(String, String, String)] =
    BruteForce.randomKB(rng, nFacts)

  private val x = Var("x"); private val y = Var("y"); private val z = Var("z")

  /** Random rule shapes the miner scores: closed 2/3-atom, dangling
    * NON-head variable, constant-carrying, instantiated head (fallback
    * scoring path), pseudo-guarded. Head variables are always bound by
    * the body — Metrics' scoring contract (only closed-on-head-vars
    * rules reach scoreAll; open search nodes are never scored). */
  private def randomRule(rng: scala.util.Random): Rule = {
    def rel() = Const(s"r${rng.nextInt(3)}")
    def ent() = Const(s"e${rng.nextInt(8)}")
    val head  = Atom(x, rel(), y)
    rng.nextInt(6) match {
      case 0 => // closed 2-atom, either orientation
        Rule(head, List(if (rng.nextBoolean()) Atom(x, rel(), y) else Atom(y, rel(), x)))
      case 1 => // closed 3-atom chain, random orientations
        def flip(a: Atom) = if (rng.nextBoolean()) a else Atom(a.o, a.p, a.s)
        Rule(head, List(flip(Atom(x, rel(), z)), flip(Atom(z, rel(), y))))
      case 2 => // dangling non-head variable z (search-node shape)
        Rule(head, List(Atom(x, rel(), y), Atom(y, rel(), z)))
      case 3 => // constant in body, still closed on head vars
        Rule(head, List(Atom(x, rel(), y), Atom(x, rel(), ent())))
      case 4 => // instantiated head object (O_I output; fallback path when
        // the functional side flips)
        Rule(Atom(x, rel(), ent()), List(Atom(x, rel(), z), Atom(z, rel(), x)))
      case _ => // 3-atom chain + differentFrom guard
        Rule(head, List(Atom(x, rel(), z), Atom(z, rel(), y),
          Atom(x, Const(Atom.DifferentFrom), z)))
    }
  }

  private def toDF(kb: Set[(String, String, String)]) = {
    import spark.implicits._
    kb.toSeq.map(t => Triple(t._1, t._2, t._3)).toDF("subj", "pred", "obj")
  }

  // ---------- Spark-job properties (few cases, each costs jobs) ----------

  test("metrics agree with brute force on random KBs and rule shapes") {
    val rng = new scala.util.Random(7)
    for (i <- 1 to 12) {
      val kb  = randomKB(rng, 16 + rng.nextInt(16))
      val r   = randomRule(rng)
      val df  = toDF(kb)
      val m   = new Metrics(df, KGStats.compute(df))
      val s   = m.score(r)
      val (support, body, pca, hs) = bruteScore(kb, r)
      withClue(s"case $i rule=$r kb=${kb.toSeq.sorted}: ") {
        assert(s.support == support)
        assert(s.bodySize == body)
        assert(s.pcaBodySize == pca)
        assert(s.headCoverage == (if (hs == 0) 0.0 else support.toDouble / hs))
        assert(s.stdConfidence == (if (body == 0) 0.0 else support.toDouble / body))
        assert(s.pcaConfidence == (if (pca == 0) 0.0 else support.toDouble / pca))
      }
    }
  }

  test("query compiler agrees with brute-force enumeration on random conjunctions") {
    val rng = new scala.util.Random(11)
    for (i <- 1 to 8) {
      val kb = randomKB(rng, 20)
      val r  = randomRule(rng)
      val df = toDF(kb)
      val vs = r.allVars
      val got = QueryBuilder.selectDistinct(df, vs, r.atoms)
        .collect().map(row => vs.indices.map(row.getString).toList).toSet
      val want = bruteBindings(kb, r.atoms).map(env => vs.map(v => env(v.name)).toList)
      withClue(s"case $i rule=$r: ") { assert(got == want) }
    }
  }

  test("stats-driven atom ordering never changes bindings, on random conjunctions") {
    val rng = new scala.util.Random(29)
    for (i <- 1 to 8) {
      val kb    = randomKB(rng, 20)
      val r     = randomRule(rng)
      val df    = toDF(kb).cache()
      val stats = KGStats.compute(df)
      val vs    = r.allVars
      def rows(d: org.apache.spark.sql.DataFrame) = d
        .select(vs.map(v => org.apache.spark.sql.functions.col(v.name)): _*)
        .distinct().collect()
        .map(row => vs.indices.map(row.getString).toList).toSet
      val plain   = rows(QueryBuilder.bindings(df, r.atoms))
      val ordered = rows(QueryBuilder.bindings(df, r.atoms, Some(stats)))
      withClue(s"case $i rule=$r: ") { assert(ordered == plain) }
      df.unpersist()
    }
  }

  test("connected-subgraph existential dedup matches brute force on random witness chains") {
    // the KB.java:3026-3058 connectedComponent-rewrite generalization:
    // multi-atom chains hanging off the counted variables through a single
    // articulation variable (and fully detached chains) must never change
    // the distinct image of the kept variables, under every keep set and
    // with/without stats-driven plans
    val rng = new scala.util.Random(41)
    val w = Var("w"); val u = Var("u")
    for (i <- 1 to 10) {
      val kb = randomKB(rng, 24)
      def rel()         = Const(s"r${rng.nextInt(3)}")
      def flip(a: Atom) = if (rng.nextBoolean()) a else Atom(a.o, a.p, a.s)
      val main = Atom(x, rel(), y)
      val extra: List[Atom] = rng.nextInt(4) match {
        case 0 => // 2-atom chain off y
          List(flip(Atom(y, rel(), z)), flip(Atom(z, rel(), w)))
        case 1 => // 3-atom chain off y
          List(flip(Atom(y, rel(), z)), flip(Atom(z, rel(), w)),
            flip(Atom(w, rel(), u)))
        case 2 => // two chains, off y and off x
          List(flip(Atom(y, rel(), z)), flip(Atom(z, rel(), w)),
            flip(Atom(x, rel(), u)))
        case _ => // fully detached 2-atom chain (no articulation variable)
          List(flip(Atom(z, rel(), w)), flip(Atom(w, rel(), u)))
      }
      val atoms = main :: extra
      val keep  = if (rng.nextBoolean()) Set("x") else Set("x", "y")
      val cols  = keep.toSeq.sorted
      val df    = toDF(kb).cache()
      val stats = KGStats.compute(df)
      def img(d: org.apache.spark.sql.DataFrame) = d
        .select(cols.map(org.apache.spark.sql.functions.col): _*).distinct()
        .collect().map(r => cols.indices.map(r.getString).toList).toSet
      val want = bruteBindings(kb, atoms)
        .map(env => cols.map(env).toList)
      val gotS = img(QueryBuilder.distinctableBindings(df, atoms, keep, Some(stats)))
      val got0 = img(QueryBuilder.distinctableBindings(df, atoms, keep, None))
      withClue(s"case $i atoms=$atoms keep=$keep: ") {
        assert(gotS == want); assert(got0 == want)
      }
      df.unpersist()
    }
  }

  // ---------- pure-driver properties (hundreds of cases) ----------

  test("canonical form is invariant under variable renaming and body permutation") {
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val r = randomRule(rng)
      // random injective variable renaming
      val names  = r.allVars.map(_.name)
      val images = rng.shuffle(List("a", "b", "c", "d")).take(names.size)
      val ren    = names.zip(images).toMap
      def sub(t: Term): Term = t match { case Var(n) => Var(ren(n)); case c => c }
      def subA(a: Atom)      = Atom(sub(a.s), if (a.isPseudo) a.p else sub(a.p), sub(a.o))
      val r2 = Rule(subA(r.head), rng.shuffle(r.body).map(subA))
      assert(r.canonical == r2.canonical, s"$r vs $r2")
      assert(Rule.equivalent(r, r2), s"$r vs $r2")
    }
  }

  test("equivalent(r1, r2) iff canonical forms match, on random rule pairs") {
    val rng = new scala.util.Random(17)
    for (i <- 1 to 400) {
      val r1 = randomRule(rng)
      // every 4th pair is an alpha-renamed permutation of r1 → the
      // positive branch of the iff is exercised, not just the negative
      val r2 =
        if (i % 4 == 0) {
          val ren = r1.allVars.map(_.name).zip(Seq("p", "q", "r")).toMap
          def sub(t: Term): Term = t match { case Var(n) => Var(ren(n)); case c => c }
          Rule(Atom(sub(r1.head.s), r1.head.p, sub(r1.head.o)),
            rng.shuffle(r1.body).map(a => Atom(sub(a.s), a.p, sub(a.o))))
        } else randomRule(rng)
      val eq = Rule.equivalent(r1, r2)
      assert(eq == (r1.canonical == r2.canonical), s"$r1 vs $r2")
      if (i % 4 == 0) assert(eq)
    }
  }

  test("cardinality ordering schedules the selective template before the exploding head join") {
    // head h(x,y) ∧ body b(z,y) ∧ template cand(z,x) — the miner's hot
    // closing-template shape (15k-subject head, 1k-subject body, 25
    // shared object values). Syntactic order joins b⨝h on the 25-value
    // y second (600k-row explosion); the estimator must grow from the
    // small body through the subject-selective template (1k rows) and
    // join the fat head LAST (both its variables then bound)
    val stats = KGStats(Map(
      "h" -> RelationStats("h", 15000, 15000, 25),
      "b" -> RelationStats("b", 1000, 1000, 25)), 16000)
    val h   = Atom(Var("x"), Const("h"), Var("y"))
    val b   = Atom(Var("z"), Const("b"), Var("y"))
    val tpl = Atom(Var("z"), Var("cand"), Var("x"))
    val ordered = QueryBuilder.cardinalityOrder(Seq(h, b, tpl), stats)
    assert(ordered == Seq(b, tpl, h), s"got: $ordered")
    // ordering never drops or duplicates atoms
    assert(ordered.toSet == Set(h, b, tpl) && ordered.size == 3)
    // with ≤ 2 atoms the connectivity order is kept verbatim
    assert(QueryBuilder.cardinalityOrder(Seq(h, b), stats) == Seq(h, b))
  }
}
