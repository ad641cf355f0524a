package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.Sessions
import graft.mine.{Rule, RuleApply, RuleParser}

/**
 * Rule-based link-prediction CLI — the Spark-native analog of the
 * reference's `inference/linkprediction.py` (PyClause harness: rules
 * mined by AMIE applied over `DATA_PATH/{train,valid,test}.tsv`, maxplus
 * aggregation, filtered head/tail rankings, MRR + hits@1/3/10 printed).
 *
 *   spark-submit --class graft.tools.LinkPredictCLI graft.jar \
 *     /data/fb15k237 /runs/mined-rules.tsv [-agg maxplus] [-cm pca]
 *
 * DATA_PATH follows linkprediction.py:34-36 (`train.tsv` = KB the rules
 * are applied over, `valid.tsv` = extra filter set, `test.tsv` = ranked
 * targets); any file may be overridden with -train/-valid/-test, and
 * -valid "" drops the valid split. RULES_FILE is either this engine's /
 * the reference's mined-rule TSV (header with `Rule` +
 * Std/PcaConfidence columns — the formats RuleSink writes) or a plain
 * text file of `rule[\tconfidence]` lines.
 */
object LinkPredictCLI {

  private val usage =
    """usage: LinkPredictCLI <data_path> <rules_file> [options]
      |  data_path        dir holding train.tsv / valid.tsv / test.tsv
      |  rules_file       mined-rule TSV (Rule + confidence columns) or
      |                   plain 'rule<TAB>confidence' lines
      |  -train/-valid/-test <path>   override a split (-valid "" = none)
      |  -ifmt <f>        fact format: tsv|nt|ttl|parquet (default sniffed)
      |  -cm std|pca      confidence column to score with (default pca)
      |  -agg max|maxplus score aggregation (default maxplus)
      |  -o <path>        also write new predicted triples (not in train) as
      |                   TSV subj/pred/obj/conf; conf is the max over the
      |                   firing rules (under -agg maxplus: the head of the
      |                   descending score vector — the same max)
      |  -cores <n>       local-mode core count when not under spark-submit
      |""".stripMargin

  final case class Args(
      dataPath: String = "", rulesFile: String = "",
      train: String = "", valid: Option[String] = None, test: String = "",
      ifmt: String = "", cm: String = "pca", agg: String = "maxplus",
      output: String = "",
      cores: Int = Runtime.getRuntime.availableProcessors()) {
    def trainPath: String = if (train.nonEmpty) train else s"$dataPath/train.tsv"
    def validPath: String = valid.getOrElse(
      if (dataPath.nonEmpty) s"$dataPath/valid.tsv" else "")
    def testPath: String = if (test.nonEmpty) test else s"$dataPath/test.tsv"
  }

  private[graft] def parse(argv: Seq[String]): Args = {
    @annotation.tailrec
    def go(rest: List[String], a: Args): Args = rest match {
      case Nil                 => a
      case "-train" :: v :: t  => go(t, a.copy(train = v))
      case "-valid" :: v :: t  => go(t, a.copy(valid = Some(v)))
      case "-test" :: v :: t   => go(t, a.copy(test = v))
      case "-ifmt" :: v :: t   => go(t, a.copy(ifmt = v))
      case "-cm" :: v :: t     => go(t, a.copy(cm = v))
      case "-agg" :: v :: t    => go(t, a.copy(agg = v))
      case "-o" :: v :: t      => go(t, a.copy(output = v))
      case "-cores" :: v :: t  => go(t, a.copy(cores = v.toInt))
      case p :: t if !p.startsWith("-") && a.dataPath.isEmpty =>
        go(t, a.copy(dataPath = p))
      case p :: t if !p.startsWith("-") && a.rulesFile.isEmpty =>
        go(t, a.copy(rulesFile = p))
      case other :: _ => sys.error(s"unknown argument: $other\n$usage")
    }
    val a0 = go(argv.toList, Args())
    // with -train/-test overriding the whole split, data_path is moot and a
    // single positional IS the rules file (ADVICE r4: the first positional
    // otherwise lands in dataPath and the rulesFile require fails even
    // though the usage text says overrides replace the split dir)
    val a =
      if (a0.rulesFile.isEmpty && a0.dataPath.nonEmpty &&
          a0.train.nonEmpty && a0.test.nonEmpty)
        a0.copy(dataPath = "", rulesFile = a0.dataPath)
      else a0
    require(a.rulesFile.nonEmpty &&
      (a.dataPath.nonEmpty || (a.train.nonEmpty && a.test.nonEmpty)), usage)
    require(Set("std", "pca")(a.cm), s"-cm must be std|pca\n$usage")
    require(Set("max", "maxplus")(a.agg), s"-agg must be max|maxplus\n$usage")
    a
  }

  /** Scored rules from a mined-rule TSV (RuleSink/reference formatter
    * header) or plain `rule[\tconf]` lines; rules are driver-sized. */
  private[graft] def loadRules(spark: SparkSession, path: String,
      cm: String): Seq[(Rule, Double)] = {
    val lines = spark.read.textFile(path).collect().toSeq
      .map(_.trim).filter(_.nonEmpty)
    require(lines.nonEmpty, s"no rules in $path")
    // a multi-part Spark CSV dir repeats the header once PER PART FILE and
    // part order is not guaranteed (ADVICE r4) — detect the header ANYWHERE
    // and drop every duplicate of it before parsing
    val headerLine = lines.find(_.split("\t").map(_.trim).contains("Rule"))
    headerLine match {
      case Some(hl) =>
        val header = hl.split("\t").map(_.trim)
        val ri = header.indexOf("Rule")
        val ci = header.indexOf(
          if (cm == "std") "StdConfidence" else "PcaConfidence")
        require(ci >= 0, s"no ${cm}Confidence column in $path header")
        lines.filterNot(_ == hl).map { l =>
          val f = l.split("\t")
          RuleParser.parseRule(f(ri)) -> f(ci).toDouble
        }
      case None => lines.map { l =>
        val f = l.split("\t")
        RuleParser.parseRule(f(0)) ->
          (if (f.length > 1) f(1).toDouble else 1.0)
      }
    }
  }

  /** The full evaluation, returned as the summary frame so tests drive
    * it without stdout scraping. */
  private[graft] def run(spark: SparkSession, a: Args): DataFrame = {
    val train = FactInput.load(spark, a.trainPath, a.ifmt)
    val test  = FactInput.load(spark, a.testPath, a.ifmt)
    val known = (if (a.validPath.nonEmpty)
      Seq(train, FactInput.load(spark, a.validPath, a.ifmt), test)
    else Seq(train, test)).reduce(_.unionByName(_))
    val rules = loadRules(spark, a.rulesFile, a.cm)
    // rule application is the expensive stage and the table feeds up to 5
    // consumers (target-score + candidate branches × 2 directions + the -o
    // dump) — materialize it once
    val preds =
      (if (a.agg == "maxplus") RuleApply.scoredPredictions(train, rules)
       else RuleApply.predictions(train, rules)).localCheckpoint()
    if (a.output.nonEmpty) {
      // derived from the SAME preds frame (ADVICE r4: recomputing via
      // newPredictions doubled the most expensive stage and, under
      // maxplus, silently dumped max-aggregated confidences); the dumped
      // conf is the max over firing rules in both modes — for maxplus
      // that is the head of the descending vector
      val conf1 =
        if (a.agg == "maxplus") col("conf").getItem(0) else col("conf")
      preds.join(train.select("subj", "pred", "obj"),
          Seq("subj", "pred", "obj"), "left_anti")
        .select(col("subj"), col("pred"), col("obj"), conf1.as("conf"))
        .write.mode("overwrite").option("sep", "\t").csv(a.output)
    }
    RuleApply.evaluate(preds, test, known)
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv.toIndexedSeq)
    val spark = SparkSession.getActiveSession
      .getOrElse(Sessions.local(a.cores, "graft-linkpredict"))
    spark.sparkContext.setLogLevel("WARN")
    val rows = run(spark, a).orderBy("direction").collect()
    println("*** EVALUATION RESULTS ***") // linkprediction.py:53-60 shape
    rows.foreach { r =>
      println(f"${r.getString(0)}%-5s MRR ${r.getDouble(1)}%.6f  " +
        f"hits@1 ${r.getDouble(2)}%.6f  hits@3 ${r.getDouble(3)}%.6f  " +
        f"hits@10 ${r.getDouble(4)}%.6f  (ranked ${r.getLong(5)}/${r.getLong(6)})")
    }
  }
}
