package graft.tools

import graft.Sessions
import graft.kb.{Atom, QueryBuilder, Var}
import graft.mine.RuleParser
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Ad-hoc conjunctive-query CLI — the analog of the reference's
 * `QueryKB.main` (kb/src/main/java/amie/data/QueryKB.java:10-34): a
 * query string `vars | atoms` where `vars` is a comma-separated
 * projection list and `atoms` a whitespace-separated triple-pattern
 * conjunction (the same syntax RuleParser accepts, including
 * differentFrom/equals pseudo-atoms and exists/~exists/cardinality
 * meta-atoms), run as selectDistinct against any fact input MineCLI
 * accepts.
 *
 *   spark-submit --class graft.tools.QueryCLI graft.jar \
 *     "?x,?y | ?x livesIn ?z  ?z isLocatedIn ?y" -i /data/facts.tsv
 *
 * Unlike the reference (prints the whole result set, fine for an
 * in-memory KB) the result may be data-sized, so stdout gets `-show`
 * rows (default 20) plus the exact distinct count; `-o` dumps the full
 * result as a TSV directory without collecting to the driver.
 */
object QueryCLI {

  private val usage =
    """usage: QueryCLI "<?v1[,?v2,…]> | <atoms>" -i <input> [options]
      |  -i <path>       input facts: .tsv/.csv, .nt, .ttl, or parquet dir
      |  -ifmt <f>       force input format: tsv|nt|ttl|parquet
      |  -o <path>       also write the full distinct result as TSV
      |  -show <n>       rows to print (default 20; 0 = none)
      |  -cores <n>      local-mode core count when not under spark-submit
      |""".stripMargin

  final case class Args(
      query: String = "", input: String = "", ifmt: String = "",
      output: String = "", show: Int = 20,
      cores: Int = Runtime.getRuntime.availableProcessors())

  private[graft] def parse(argv: Seq[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], a: Args): Args = rest match {
      case Nil                => a
      case "-i" :: v :: t     => go(t, a.copy(input = v))
      case "-ifmt" :: v :: t  => go(t, a.copy(ifmt = v))
      case "-o" :: v :: t     => go(t, a.copy(output = v))
      case "-show" :: v :: t  => go(t, a.copy(show = v.toInt))
      case "-cores" :: v :: t => go(t, a.copy(cores = v.toInt))
      case q :: t if !q.startsWith("-") && a.query.isEmpty => go(t, a.copy(query = q))
      case other :: _ => sys.error(s"unknown argument: $other\n$usage")
    }
    val a = go(argv.toList, Args())
    require(a.query.nonEmpty && a.input.nonEmpty, usage)
    a
  }

  /** `"?x,?y | atoms"` → (projection vars, conjunction). */
  private[graft] def parseQuery(q: String): (Seq[Var], List[Atom]) = {
    val parts = q.split("\\|", 2)
    require(parts.length == 2, s"query needs 'vars | atoms': '$q'\n$usage")
    val vars = parts(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case v if v.startsWith("?") => Var(v.drop(1))
      case v => sys.error(s"projection term is not a variable: '$v'")
    }
    require(vars.nonEmpty, s"empty projection: '$q'")
    val atoms = RuleParser.parseAtoms(parts(1))
    val bound = atoms.flatMap(_.vars).toSet
    vars.foreach(v => require(bound.contains(v), s"projection variable ?${v.name} not bound by any atom"))
    (vars, atoms)
  }

  /** The query surface, separated from main for tests: distinct bindings
    * of the projection variables (KB.selectDistinct semantics). */
  def run(kb: DataFrame, vars: Seq[Var], atoms: Seq[Atom]): DataFrame =
    QueryBuilder.bindings(kb, atoms)
      .select(vars.map(v => org.apache.spark.sql.functions.col(v.name)): _*)
      .distinct()

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toIndexedSeq)
    val (vars, atoms) = parseQuery(a.query)
    val preExisting = SparkSession.getDefaultSession.orElse(SparkSession.getActiveSession)
    val spark = preExisting.getOrElse {
      val builder = Sessions.tune(SparkSession.builder(), a.cores, "graft-query")
      if (sys.props.contains("spark.master") || sys.env.contains("SPARK_MASTER"))
        builder.getOrCreate()
      else builder.master(s"local[${a.cores}]").getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    try {
      println(s"Projection variables: ${vars.map("?" + _.name).mkString(", ")}")
      println(s"Conditions: ${atoms.mkString("  ")}")
      val result = run(FactInput.load(spark, a.input, a.ifmt), vars, atoms)
      if (a.output.nonEmpty) {
        result.write.mode("overwrite")
          .option("sep", "\t").option("header", "true").csv(a.output)
        println(s"full result -> ${a.output}")
      }
      if (a.show > 0) result.show(a.show, truncate = false)
      println(s"${result.count()} results")
    } finally if (preExisting.isEmpty) spark.stop()
  }
}
