package graft

import graft.kb._
import graft.mine._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps each implemented operator of SURVEY.md §2 to a DataFrame
  * over the driver's TPC-H-ish parquet tables; `oracleSql` carries the
  * equivalent ANSI SQL the driver runs in DuckDB. Column names/aliases are
  * kept identical on both sides (the driver hash-compares by sorted column
  * name).
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A KB (subj, pred, obj) view over the TPC-H-ish tables, so the KG
    * engine's operators can be oracle-checked by DuckDB with plain SQL.
    * `orderCust`/`orderPriority` add a high-cardinality, skew-free fact
    * relation; `custNation`… are the dimension-style relations. */
  def tpchTriples(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val nat  = t(spark, dir, "nation")
    val ord  = t(spark, dir, "orders")
    val custNation = cust.select(
      concat(lit("c"), col("c_custkey")).as("subj"),
      lit("custNation").as("pred"),
      concat(lit("n"), col("c_nationkey")).as("obj"))
    val suppNation = supp.select(
      concat(lit("s"), col("s_suppkey")).as("subj"),
      lit("suppNation").as("pred"),
      concat(lit("n"), col("s_nationkey")).as("obj"))
    val nationRegion = nat.select(
      concat(lit("n"), col("n_nationkey")).as("subj"),
      lit("nationRegion").as("pred"),
      concat(lit("r"), col("n_regionkey")).as("obj"))
    val custRegion = cust.join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .select(
        concat(lit("c"), col("c_custkey")).as("subj"),
        lit("custRegion").as("pred"),
        concat(lit("r"), col("n_regionkey")).as("obj"))
    val orderCust = ord.select(
      concat(lit("o"), col("o_orderkey")).as("subj"),
      lit("orderCust").as("pred"),
      concat(lit("c"), col("o_custkey")).as("obj"))
    val orderPriority = ord.select(
      concat(lit("o"), col("o_orderkey")).as("subj"),
      lit("orderPriority").as("pred"),
      col("o_orderpriority").as("obj"))
    custNation.union(suppNation).union(nationRegion).union(custRegion)
      .union(orderCust).union(orderPriority)
  }

  /** Shared SQL prefix defining the same triples view for DuckDB. */
  private val triplesCte =
    """WITH triples AS (
      |  SELECT 'c' || c_custkey AS subj, 'custNation' AS pred, 'n' || c_nationkey AS obj FROM customer
      |  UNION ALL SELECT 's' || s_suppkey, 'suppNation', 'n' || s_nationkey FROM supplier
      |  UNION ALL SELECT 'n' || n_nationkey, 'nationRegion', 'r' || n_regionkey FROM nation
      |  UNION ALL SELECT 'c' || c_custkey, 'custRegion', 'r' || n_regionkey
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  UNION ALL SELECT 'o' || o_orderkey, 'orderCust', 'c' || o_custkey FROM orders
      |  UNION ALL SELECT 'o' || o_orderkey, 'orderPriority', o_orderpriority FROM orders
      |)""".stripMargin

  /** Flagship: full rule-mining run of the KG engine on the reference's
    * fixture KB — returns the scored-rule table (driver checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rules = new Miner(
      Fixtures.baseKB(spark),
      MinerConfig(minSupport = 2, minHeadCoverage = 0.1, minPcaConfidence = 0.1)).mine()
    rules.map(s => (s.rule.amieString, s.headCoverage, s.stdConfidence,
      s.pcaConfidence, s.support, s.bodySize, s.pcaBodySize, s.functionalVariable))
      .toDF("rule", "head_coverage", "std_confidence", "pca_confidence",
        "support", "body_size", "pca_body_size", "functional_variable")
  }

  // shared query atoms
  private val custNat  = Atom(Var("c"), Const("custNation"), Var("n"))
  private val natReg   = Atom(Var("n"), Const("nationRegion"), Var("r"))
  private val custReg  = Atom(Var("c"), Const("custRegion"), Var("r"))
  private val ordCust  = Atom(Var("o"), Const("orderCust"), Var("c"))
  private val urgent   = Atom(Var("o"), Const("orderPriority"), Const("1-URGENT"))
  private val ordCust2 = Atom(Var("o2"), Const("orderCust"), Var("c"))
  private val urgent2  = Atom(Var("o2"), Const("orderPriority"), Const("1-URGENT"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.4 stats pass: relationSize / relationColumnSize / functionality
    "kb_stats" -> ((s, dir) => KGStats.statsDF(tpchTriples(s, dir))),

    // ---- §2.10 metric layer: support / bodySize / pcaBodySize / confidences
    "kb_rule_metrics" -> { (s, dir) =>
      import s.implicits._
      val kb = tpchTriples(s, dir).cache()
      val m  = new Metrics(kb, KGStats.compute(kb))
      val sc = m.score(Rule(custReg, List(custNat, natReg)))
      Seq((sc.support, sc.bodySize, sc.pcaBodySize, sc.stdConfidence, sc.pcaConfidence))
        .toDF("support", "body_size", "pca_body_size", "std_confidence", "pca_confidence")
    },

    // ---- §2.2 single-pattern selection: bindings of one variable
    "kb_select_one_var" -> { (s, dir) =>
      QueryBuilder.selectDistinct(
        tpchTriples(s, dir), Seq(Var("x")),
        Seq(Atom(Var("x"), Const("custNation"), Const("n1"))))
        .withColumnRenamed("x", "subj")
    },

    // ---- §2.3 conjunctive join: customers with a supplier in the same nation
    "kb_join_two_atoms" -> { (s, dir) =>
      QueryBuilder.selectDistinct(
        tpchTriples(s, dir), Seq(Var("c"), Var("sp")),
        Seq(Atom(Var("c"), Const("custNation"), Var("n")),
          Atom(Var("sp"), Const("suppNation"), Var("n"))))
        .select(col("c").as("cust"), col("sp").as("supp"))
    },

    // ---- §2.4 countBindings: histogram of customers per nation
    "kb_count_bindings" -> { (s, dir) =>
      Ops.countBindings(tpchTriples(s, dir), Var("n"), Seq(custNat))
        .select(col("n").as("nation"), col("cnt"))
    },

    // ---- §2.4 frequentBindingsOf: per region, #distinct customers
    "kb_frequent_bindings" -> { (s, dir) =>
      Ops.frequentBindingsOf(tpchTriples(s, dir), Var("r"), Var("c"), Seq(custNat, natReg))
        .select(col("r").as("region"), col("cnt").as("cust_cnt"))
    },

    // ---- §2.4 countProjectionBindings: per nation, #head (c,r) instantiations
    "kb_count_projection" -> { (s, dir) =>
      Ops.countProjectionBindings(tpchTriples(s, dir), custReg, Seq(custNat, natReg), Var("n"))
        .select(col("n").as("nation"), col("cnt").as("head_cnt"))
    },

    // ---- §2.3 difference: customers with an order but no URGENT order
    "kb_difference" -> { (s, dir) =>
      Ops.difference(tpchTriples(s, dir), Seq(Var("c")),
        Seq(ordCust), Seq(ordCust2, urgent2))
        .select(col("c").as("cust"))
    },

    // ---- §2.2 meta-relation exists: customers with ≥1 URGENT order
    "kb_exists" -> { (s, dir) =>
      Ops.selectWhereExists(tpchTriples(s, dir), Seq(Var("c")),
        Seq(custNat), Seq(ordCust2, urgent2))
        .select(col("c").as("cust"))
    },

    // ---- §2.2 meta-relation ~exists: customers with no URGENT order
    "kb_not_exists" -> { (s, dir) =>
      Ops.selectWhereNotExists(tpchTriples(s, dir), Seq(Var("c")),
        Seq(custNat), Seq(ordCust2, urgent2))
        .select(col("c").as("cust"))
    },

    // ---- §2.4 cardinality histogram + right-cumulative (orders per customer)
    "kb_cardinality_hist" -> { (s, dir) =>
      Ops.cardinalityHistogram(tpchTriples(s, dir), "obj", "subj")
        .select(col("pred"), col("n"), col("keys"), col("cum_keys"))
    },

    // ---- §2.4 variance of values-per-key per relation
    "kb_variance" -> { (s, dir) =>
      Ops.varianceOfCounts(tpchTriples(s, dir), "obj", "subj")
    },

    // ---- §2.4 overlap tables: |subj(r1) ∩ subj(r2)|
    "kb_overlaps" -> { (s, dir) =>
      KGStats.overlaps(tpchTriples(s, dir), "subj", "subj")
        .select(col("p1"), col("p2"), col("overlap"))
    },

    // ---- §2.5 decreasingKeys: relations with ≥100 facts, largest first
    "kb_relations_by_size" -> { (s, dir) =>
      Ops.relationsBySize(tpchTriples(s, dir), 100L)
    },

    // ---- §2.5 bounded distinct-pair count (early-stop denominator)
    "kb_pairs_upto" -> { (s, dir) =>
      import s.implicits._
      val n = Ops.countDistinctUpTo(tpchTriples(s, dir), 1000L,
        Seq(Var("c"), Var("r")), Seq(custNat, natReg))
      Seq(n).toDF("n")
    },

    // ---- §2.2 contains(fact)
    "kb_contains" -> { (s, dir) =>
      import s.implicits._
      Seq(Ops.containsFact(tpchTriples(s, dir), "n1", "nationRegion", "r1"))
        .toDF("contains")
    })

  def oracleSql: Map[String, String] = Map(
    "kb_stats" ->
      s"""$triplesCte
         |SELECT pred, count(*) AS size,
         |       count(DISTINCT subj) AS distinct_subj,
         |       count(DISTINCT obj) AS distinct_obj,
         |       CAST(count(DISTINCT subj) AS DOUBLE) / count(*) AS functionality,
         |       CAST(count(DISTINCT obj) AS DOUBLE) / count(*) AS inv_functionality
         |FROM triples GROUP BY pred""".stripMargin,
    "kb_rule_metrics" ->
      s"""$triplesCte,
         |body AS (
         |  SELECT DISTINCT a.subj AS x, b.obj AS r
         |  FROM triples a JOIN triples b ON a.obj = b.subj
         |  WHERE a.pred = 'custNation' AND b.pred = 'nationRegion'),
         |head AS (SELECT subj AS x, obj AS r FROM triples WHERE pred = 'custRegion'),
         |supp AS (SELECT count(*) AS support FROM (SELECT DISTINCT body.x, body.r FROM body JOIN head ON body.x = head.x AND body.r = head.r)),
         |bs AS (SELECT count(*) AS body_size FROM body),
         |pca AS (SELECT count(*) AS pca_body_size FROM (SELECT DISTINCT body.x, body.r FROM body JOIN head ON body.x = head.x))
         |SELECT support, body_size, pca_body_size,
         |       CAST(support AS DOUBLE) / body_size AS std_confidence,
         |       CAST(support AS DOUBLE) / pca_body_size AS pca_confidence
         |FROM supp, bs, pca""".stripMargin,
    "kb_select_one_var" ->
      s"""$triplesCte
         |SELECT DISTINCT subj FROM triples WHERE pred = 'custNation' AND obj = 'n1'""".stripMargin,
    "kb_join_two_atoms" ->
      s"""$triplesCte
         |SELECT DISTINCT a.subj AS cust, b.subj AS supp
         |FROM triples a JOIN triples b ON a.obj = b.obj
         |WHERE a.pred = 'custNation' AND b.pred = 'suppNation'""".stripMargin,
    "kb_count_bindings" ->
      s"""$triplesCte
         |SELECT obj AS nation, count(*) AS cnt FROM triples
         |WHERE pred = 'custNation' GROUP BY obj""".stripMargin,
    "kb_frequent_bindings" ->
      s"""$triplesCte
         |SELECT b.obj AS region, count(DISTINCT a.subj) AS cust_cnt
         |FROM triples a JOIN triples b ON a.obj = b.subj
         |WHERE a.pred = 'custNation' AND b.pred = 'nationRegion'
         |GROUP BY b.obj""".stripMargin,
    "kb_count_projection" ->
      s"""$triplesCte
         |SELECT a.obj AS nation, count(DISTINCT h.subj || '|' || h.obj) AS head_cnt
         |FROM triples h
         |JOIN triples a ON h.subj = a.subj
         |JOIN triples b ON a.obj = b.subj AND h.obj = b.obj
         |WHERE h.pred = 'custRegion' AND a.pred = 'custNation' AND b.pred = 'nationRegion'
         |GROUP BY a.obj""".stripMargin,
    "kb_difference" ->
      s"""$triplesCte
         |SELECT DISTINCT obj AS cust FROM triples WHERE pred = 'orderCust'
         |  AND obj NOT IN (
         |    SELECT a.obj FROM triples a JOIN triples p ON a.subj = p.subj
         |    WHERE a.pred = 'orderCust' AND p.pred = 'orderPriority' AND p.obj = '1-URGENT')""".stripMargin,
    "kb_exists" ->
      s"""$triplesCte
         |SELECT DISTINCT subj AS cust FROM triples WHERE pred = 'custNation'
         |  AND subj IN (
         |    SELECT a.obj FROM triples a JOIN triples p ON a.subj = p.subj
         |    WHERE a.pred = 'orderCust' AND p.pred = 'orderPriority' AND p.obj = '1-URGENT')""".stripMargin,
    "kb_not_exists" ->
      s"""$triplesCte
         |SELECT DISTINCT subj AS cust FROM triples WHERE pred = 'custNation'
         |  AND subj NOT IN (
         |    SELECT a.obj FROM triples a JOIN triples p ON a.subj = p.subj
         |    WHERE a.pred = 'orderCust' AND p.pred = 'orderPriority' AND p.obj = '1-URGENT')""".stripMargin,
    "kb_cardinality_hist" ->
      s"""$triplesCte,
         |per_key AS (
         |  SELECT pred, obj, count(DISTINCT subj) AS n FROM triples GROUP BY pred, obj),
         |hist AS (SELECT pred, n, count(*) AS keys FROM per_key GROUP BY pred, n)
         |SELECT pred, n, keys,
         |       CAST(SUM(keys) OVER (PARTITION BY pred ORDER BY n DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_keys
         |FROM hist""".stripMargin,
    "kb_variance" ->
      s"""$triplesCte,
         |per_key AS (
         |  SELECT pred, obj, count(DISTINCT subj) AS n FROM triples GROUP BY pred, obj),
         |sums AS (SELECT pred, SUM(n) AS s1, SUM(n*n) AS s2, count(*) AS k FROM per_key GROUP BY pred)
         |SELECT pred,
         |  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / k AS variance
         |FROM sums""".stripMargin,
    "kb_overlaps" ->
      s"""$triplesCte,
         |se AS (SELECT DISTINCT pred, subj AS e FROM triples)
         |SELECT a.pred AS p1, b.pred AS p2, count(*) AS overlap
         |FROM se a JOIN se b ON a.e = b.e
         |GROUP BY a.pred, b.pred""".stripMargin,
    "kb_relations_by_size" ->
      s"""$triplesCte
         |SELECT pred, count(*) AS size FROM triples
         |GROUP BY pred HAVING count(*) >= 100 ORDER BY size DESC, pred""".stripMargin,
    "kb_pairs_upto" ->
      s"""$triplesCte
         |SELECT count(*) AS n FROM (
         |  SELECT DISTINCT a.subj, b.obj
         |  FROM triples a JOIN triples b ON a.obj = b.subj
         |  WHERE a.pred = 'custNation' AND b.pred = 'nationRegion'
         |  LIMIT 1001)""".stripMargin,
    "kb_contains" ->
      s"""$triplesCte
         |SELECT count(*) > 0 AS contains FROM triples
         |WHERE subj = 'n1' AND pred = 'nationRegion' AND obj = 'r1'""".stripMargin)
}
