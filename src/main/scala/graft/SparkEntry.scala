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
    * engine's operators can be oracle-checked by DuckDB with plain SQL. */
  def tpchTriples(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val supp = t(spark, dir, "supplier")
    val nat  = t(spark, dir, "nation")
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
    custNation.union(suppNation).union(nationRegion).union(custRegion)
  }

  /** Shared SQL prefix defining the same triples view for DuckDB. */
  private val triplesCte =
    """WITH triples AS (
      |  SELECT 'c' || c_custkey AS subj, 'custNation' AS pred, 'n' || c_nationkey AS obj FROM customer
      |  UNION ALL SELECT 's' || s_suppkey, 'suppNation', 'n' || s_nationkey FROM supplier
      |  UNION ALL SELECT 'n' || n_nationkey, 'nationRegion', 'r' || n_regionkey FROM nation
      |  UNION ALL SELECT 'c' || c_custkey, 'custRegion', 'r' || n_regionkey
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 stats pass: relationSize / relationColumnSize / functionality
    "kb_stats" -> ((s, dir) => KGStats.statsDF(tpchTriples(s, dir))),

    // §2.10 metric layer: support / bodySize / pcaBodySize / confidences of
    // the fixed rule custNation(x,n) ∧ nationRegion(n,r) ⇒ custRegion(x,r)
    "kb_rule_metrics" -> { (s, dir) =>
      import s.implicits._
      val kb = tpchTriples(s, dir).cache()
      val m  = new Metrics(kb, KGStats.compute(kb))
      val rule = Rule(
        Atom(Var("x"), Const("custRegion"), Var("r")),
        List(Atom(Var("x"), Const("custNation"), Var("n")),
          Atom(Var("n"), Const("nationRegion"), Var("r"))))
      val sc = m.score(rule)
      Seq((sc.support, sc.bodySize, sc.pcaBodySize, sc.stdConfidence, sc.pcaConfidence))
        .toDF("support", "body_size", "pca_body_size", "std_confidence", "pca_confidence")
    },

    // §2.2 single-pattern selection: bindings of one variable
    "kb_select_one_var" -> { (s, dir) =>
      QueryBuilder.selectDistinct(
        tpchTriples(s, dir), Seq(Var("x")),
        Seq(Atom(Var("x"), Const("custNation"), Const("n1"))))
        .withColumnRenamed("x", "subj")
    },

    // §2.3 conjunctive join: customers with a supplier in the same nation
    "kb_join_two_atoms" -> { (s, dir) =>
      QueryBuilder.selectDistinct(
        tpchTriples(s, dir), Seq(Var("c"), Var("sp")),
        Seq(Atom(Var("c"), Const("custNation"), Var("n")),
          Atom(Var("sp"), Const("suppNation"), Var("n"))))
        .select(col("c").as("cust"), col("sp").as("supp"))
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
         |WHERE a.pred = 'custNation' AND b.pred = 'suppNation'""".stripMargin)
}
