package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * RDF sources — the Spark re-expression of the reference's Turtle/N3
 * loading path (KB.java:228-247 hands files to an RDF4J parser whose
 * statements land in StoreStatementToKB.java:10-69).
 *
 * Two entry points with different scale envelopes:
 *
 *  - [[loadNTriples]]: N-Triples is line-delimited, so `spark.read.text`
 *    + three codegen'd regexp extractions parse it fully distributed —
 *    this is the 100-TB path (RDF dumps ship as N-Triples for exactly
 *    this reason).
 *  - [[loadTurtle]]: Turtle statements span lines (`;`/`,` continuation,
 *    `[...]` blank-node property lists, `(...)` collections, long
 *    literals), so each FILE is parsed as a unit (`wholetext`) by a
 *    small recursive-descent parser — parallel across files, single-pass
 *    per file. Fine for the many-file layout real dumps use; convert to
 *    N-Triples for single-file behemoths. Anonymous blank nodes get
 *    DETERMINISTIC labels `_:g<pathmd5>n<k>` (statement order within the
 *    file × an md5 salt of the file path) — stable across runs and
 *    partitionings, collision-free across files, unlike a parser-global
 *    arrival counter.
 *
 * Both emit full IRIs (brackets stripped, RDF4J `String.valueOf` shape);
 * [[compactIris]] reproduces the reference's namespace compaction
 * (StoreStatementToKB.getFormattedValue) with DETERMINISTIC prefix ids
 * (sorted-namespace rank, not encounter order — encounter order does not
 * exist in a distributed load).
 */
object RdfFacts {

  // ---- N-Triples ----------------------------------------------------

  private val NtLine =
    """^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(<[^>]*>|_:\S+|".*"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)\s*\.\s*$"""

  /** Parse N-Triples: one statement per line, comments/blank lines
    * skipped, IRI brackets stripped, literals kept in their
    * `"lex"[@lang|^^<type>]` form. */
  def loadNTriples(spark: SparkSession, path: String, strict: Boolean = false): DataFrame = {
    def unbracket(c: Column): Column =
      when(c.startsWith("<"), substring(c, lit(2), length(c) - 2)).otherwise(c)
    val raw = spark.read.text(path)
      .where(!col("value").rlike("^\\s*(#.*)?$"))
    // strict: the reference's RDF4J parser errors loudly on malformed
    // statements; silently dropping lines would build a KB from partial
    // data with no signal
    if (strict) {
      val bad = raw.where(!col("value").rlike(NtLine)).limit(5)
        .collect().map(_.getString(0))
      if (bad.nonEmpty) throw new IllegalArgumentException(
        "unparseable N-Triples line(s), e.g.: " + bad.mkString(" | "))
    }
    val parsed = raw.select(
      regexp_extract(col("value"), NtLine, 1).as("s"),
      regexp_extract(col("value"), NtLine, 2).as("p"),
      regexp_extract(col("value"), NtLine, 3).as("o"))
      .where(col("s") =!= "" && col("p") =!= "" && col("o") =!= "")
    parsed.select(
      unbracket(col("s")).as("subj"),
      unbracket(col("p")).as("pred"),
      unbracket(col("o")).as("obj"))
  }

  // ---- Turtle subset ------------------------------------------------

  /** Load Turtle files: `@prefix`/`PREFIX` declarations, `a` keyword,
    * `;` and `,` continuations, comments, quoted literals with escapes
    * (short/long, single/double-quoted), `@lang` / `^^` suffixes,
    * `[...]` blank-node property lists (incl. as anonymous subject) and
    * `(...)` collections (lowered to rdf:first/rest/nil chains). One
    * parse per file, parallel across files. */
  def loadTurtle(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("path"), col("value"))
      .as[(String, String)]
      .flatMap { case (p, content) => parseTurtle(content, bnodeSalt(p)) }
      .toDF("subj", "pred", "obj")
  }

  /** 8-hex md5 of the file path — scopes anonymous-bnode labels per file
    * (Turtle bnodes are document-scoped; a global counter has no
    * deterministic distributed analog). */
  private[sources] def bnodeSalt(path: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  private val RdfNs    = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  private val RdfType  = RdfNs + "type"
  private val RdfFirst = RdfNs + "first"
  private val RdfRest  = RdfNs + "rest"
  private val RdfNil   = RdfNs + "nil"

  /** Tokenize + parse one Turtle document. Package-visible for the spec. */
  private[sources] def parseTurtle(content: String,
      salt: String = ""): Seq[(String, String, String)] = {
    val toks = tokenize(content)
    val prefixes = scala.collection.mutable.Map[String, String]()
    val out = scala.collection.mutable.ArrayBuffer[(String, String, String)]()
    var bnodeN = 0
    def fresh(): String = { val b = s"_:g${salt}n$bnodeN"; bnodeN += 1; b }

    def expand(pfx: String, local: String): String =
      prefixes.get(pfx) match {
        case Some(ns) => ns + local
        case None     => throw new IllegalArgumentException(s"undeclared prefix '$pfx:'")
      }

    val Xsd = "http://www.w3.org/2001/XMLSchema#"

    def resolve(t: Token): String = t match {
      case Iri(v)               => v
      case BNode(v)             => v
      case Keyword("a")         => RdfType
      case Prefixed(pfx, local) => expand(pfx, local)
      case Lit(v) =>
        // a prefixed datatype after ^^ resolves against the prefix table,
        // keeping the bracketed full-IRI form the N-Triples loader emits.
        // The separator is the ^^ AFTER the closing quote (the lexical
        // part may itself contain ^^).
        val k = v.indexOf("^^", v.lastIndexOf('"'))
        if (k < 0 || v.startsWith("^^<", k)) v
        else {
          val dt = v.substring(k + 2)
          val c  = dt.indexOf(':')
          require(c > 0, s"malformed datatype '$dt'")
          v.substring(0, k) + "^^<" + expand(dt.substring(0, c), dt.substring(c + 1)) + ">"
        }
      case Keyword(k) =>
        // Turtle shorthand literals (integer / decimal / double / boolean)
        val dt =
          if (k == "true" || k == "false") Some("boolean")
          else if (k.matches("[+-]?[0-9]+")) Some("integer")
          else if (k.matches("[+-]?[0-9]*\\.[0-9]+")) Some("decimal")
          else if (k.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)[eE][+-]?[0-9]+")) Some("double")
          else None
        dt match {
          case Some(d) => "\"" + k + "\"^^<" + Xsd + d + ">"
          case None    => throw new IllegalArgumentException(s"unexpected '$k'")
        }
      case Punct(c) => throw new IllegalArgumentException(s"unexpected '$c'")
    }

    var i = 0

    // term := IRI | prefixed | bnode | literal | '[' predObjList? ']' |
    //         '(' term* ')'. Property lists allocate a fresh bnode and
    //         emit their triples inline; collections lower to the
    //         rdf:first/rest/nil chain (one fresh bnode per element).
    def parseTerm(): String = toks(i) match {
      case Punct('[') =>
        i += 1
        val b = fresh()
        if (toks(i) == Punct(']')) i += 1
        else {
          parsePredObjList(b)
          require(i < toks.length && toks(i) == Punct(']'),
            s"expected ] got ${toks.lift(i)}")
          i += 1
        }
        b
      case Punct('(') =>
        i += 1
        val items = scala.collection.mutable.ArrayBuffer[String]()
        while (i < toks.length && toks(i) != Punct(')')) items += parseTerm()
        require(i < toks.length, "unterminated collection")
        i += 1
        if (items.isEmpty) RdfNil
        else {
          val nodes = Seq.fill(items.length)(fresh())
          for (k <- items.indices) {
            out += ((nodes(k), RdfFirst, items(k)))
            out += ((nodes(k), RdfRest,
              if (k == items.length - 1) RdfNil else nodes(k + 1)))
          }
          nodes.head
        }
      case t => i += 1; resolve(t)
    }

    // predObjList := verb objectList (';'+ (verb objectList)?)*
    def parsePredObjList(subj: String): Unit = {
      var cont = true
      while (cont) {
        val pred = resolve(toks(i)); i += 1
        out += ((subj, pred, parseTerm()))
        while (i < toks.length && toks(i) == Punct(',')) {
          i += 1; out += ((subj, pred, parseTerm()))
        }
        if (i < toks.length && toks(i) == Punct(';')) {
          while (i < toks.length && toks(i) == Punct(';')) i += 1
          cont = i < toks.length &&
            toks(i) != Punct('.') && toks(i) != Punct(']')
        } else cont = false
      }
    }

    while (i < toks.length) {
      toks(i) match {
        case Keyword("@prefix") | Keyword("PREFIX") =>
          (toks(i + 1), toks(i + 2)) match {
            case (Prefixed(pfx, ""), Iri(ns)) => prefixes(pfx) = ns
            case other => throw new IllegalArgumentException(s"bad @prefix: $other")
          }
          i += 3
          if (i < toks.length && toks(i) == Punct('.')) i += 1
        case Keyword("@base") | Keyword("BASE") =>
          i += 2 // subset: base IRIs accepted but not applied
          if (i < toks.length && toks(i) == Punct('.')) i += 1
        case _ =>
          // statement: subject predObjList '.' — a subject-only
          // '[ ... ] .' statement (Turtle grammar production [6]
          // triples, 2nd alternative) is the bare-term case below
          val subj = parseTerm()
          if (!(i < toks.length && toks(i) == Punct('.'))) parsePredObjList(subj)
          require(i < toks.length && toks(i) == Punct('.'),
            s"expected . got ${toks.lift(i)}")
          i += 1
      }
    }
    out.toSeq
  }

  private sealed trait Token
  private case class Iri(v: String)                    extends Token
  private case class Prefixed(pfx: String, l: String)  extends Token
  private case class Lit(v: String)                    extends Token
  private case class BNode(v: String)                  extends Token
  private case class Keyword(v: String)                extends Token
  private case class Punct(c: Char)                    extends Token

  private def tokenize(s: String): IndexedSeq[Token] = {
    val out = scala.collection.mutable.ArrayBuffer[Token]()
    var i = 0
    def isBoundary(c: Char) = c.isWhitespace || c == ';' || c == ',' ||
      c == '(' || c == ')' || c == '[' || c == ']'
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '#' => while (i < s.length && s(i) != '\n') i += 1
        case c @ ('[' | ']' | '(' | ')') => out += Punct(c); i += 1
        case '<' =>
          val j = s.indexOf('>', i)
          require(j > 0, "unterminated IRI")
          out += Iri(s.substring(i + 1, j)); i = j + 1
        case q @ ('"' | '\'') =>
          // quoted lexical form — short or long (""" / '''), double or
          // single quoted — incl. escapes, then optional @lang / ^^ref.
          // Normalized to the canonical double-quoted single-line form
          // the N-Triples loader emits: raw " escaped, newlines/CR/tab
          // escaped, \' unescaped ("""a↵b""" ≡ the NT token "a\nb").
          val qqq  = s"$q$q$q"
          val body = new StringBuilder
          if (s.startsWith(qqq, i)) {
            i += 3
            while (!s.startsWith(qqq, i)) {
              require(i < s.length, "unterminated long literal")
              if (s(i) == '\\') { body.append(s(i)).append(s(i + 1)); i += 2 }
              else { body.append(s(i)); i += 1 }
            }
            i += 3
          } else {
            i += 1
            while (s(i) != q) {
              if (s(i) == '\\') { body.append(s(i)).append(s(i + 1)); i += 2 }
              else { body.append(s(i)); i += 1 }
            }
            i += 1
          }
          val sb = new StringBuilder("\"")
          var k = 0
          while (k < body.length) {
            body(k) match {
              case '\\' if k + 1 < body.length =>
                if (body(k + 1) == '\'') sb.append('\'')
                else sb.append('\\').append(body(k + 1))
                k += 2
              case '"'  => sb.append("\\\""); k += 1
              case '\n' => sb.append("\\n");  k += 1
              case '\r' => sb.append("\\r");  k += 1
              case '\t' => sb.append("\\t");  k += 1
              case c    => sb.append(c);      k += 1
            }
          }
          sb.append('"')
          if (i < s.length && s(i) == '@') {
            while (i < s.length && !isBoundary(s(i)) && s(i) != '.') { sb.append(s(i)); i += 1 }
          } else if (i + 1 < s.length && s(i) == '^' && s(i + 1) == '^') {
            sb.append("^^"); i += 2
            if (s(i) == '<') {
              val j = s.indexOf('>', i)
              sb.append(s.substring(i, j + 1)); i = j + 1
            } else {
              while (i < s.length && !isBoundary(s(i)) && s(i) != '.') { sb.append(s(i)); i += 1 }
            }
          }
          out += Lit(sb.toString)
        case c @ (';' | ',') => out += Punct(c); i += 1
        case '.' if i + 1 >= s.length || s(i + 1).isWhitespace || s(i + 1) == '#' =>
          out += Punct('.'); i += 1
        case _ =>
          val start = i
          while (i < s.length && !isBoundary(s(i)) &&
            !(s(i) == '.' && (i + 1 >= s.length || s(i + 1).isWhitespace))) i += 1
          val w = s.substring(start, i)
          w match {
            case "a"                                   => out += Keyword("a")
            case "@prefix" | "@base" | "PREFIX" | "BASE" => out += Keyword(w)
            case _ if w.startsWith("_:")               => out += BNode(w)
            case _ if w.contains(":") =>
              val k = w.indexOf(':')
              out += Prefixed(w.substring(0, k), w.substring(k + 1))
            case _ => out += Keyword(w)
          }
      }
    }
    out.toIndexedSeq
  }

  // ---- namespace compaction ------------------------------------------

  /**
   * The reference's IRI compaction (StoreStatementToKB.getFormattedValue):
   * plain quoted literals and "website-shaped" values (ending in `/` or
   * with exactly two slashes) stay as-is; everything else is split at the
   * last `#` (else last `/`) into namespace + local and rendered
   * `p<k>:<local>` (typed literals keep their `lex^^` head). Prefix ids
   * `p<k>` come from the SORTED distinct-namespace rank — deterministic
   * under any partitioning, unlike the reference's arrival counter.
   * Returns (compacted triples, prefix table (prefix, namespace)).
   */
  def compactIris(triples: DataFrame): (DataFrame, DataFrame) = {
    // the IRI portion to compact: after ^^ for typed literals, with
    // surrounding <> stripped (the loaders keep datatype IRIs bracketed
    // inside the literal token) — compacted output is bracketless
    def tgt(c: Column): Column = {
      val after = when(c.contains("^^"), substring_index(c, "^", -1)).otherwise(c)
      when(after.startsWith("<") && after.endsWith(">"),
        substring(after, lit(2), length(after) - 2)).otherwise(after)
    }
    def upToLast(c: Column, sep: String): Column =
      substring(c, lit(1), length(c) - length(substring_index(c, sep, -1)))
    def slashes(c: Column): Column = length(c) - length(regexp_replace(c, "/", ""))
    def nsOf(c: Column): Column = {
      val t = tgt(c)
      when(c.contains("\"") && !c.contains("^^"), lit(null))
        .when(c.endsWith("/") || slashes(c) === 2, lit(null))
        .when(t.contains("#") && !t.endsWith("#"), upToLast(t, "#"))
        .when(t.contains("/"), upToLast(t, "/"))
        .otherwise(lit(null))
    }

    val cols = Seq("subj", "pred", "obj")
    val ns = cols.map(c => triples.select(nsOf(col(c)).as("namespace")))
      .reduce(_ union _)
      .where(col("namespace").isNotNull).distinct()
    // scalable sorted rank — output-identical to a global
    // `row_number() OVER (ORDER BY namespace)` but range-partitioned
    // (the unpartitioned window was a latent single-task sort; a
    // web-scale RDF corpus has millions of distinct namespaces)
    val prefixTable = graft.kb.Dictionary.sortedRanks(ns, "namespace", "__rk")
      .select(concat(lit("p"), col("__rk") - 1).as("prefix"), col("namespace"))

    def compact(df: DataFrame, c: String): DataFrame = {
      val withNs = df.withColumn("__ns", nsOf(col(c)))
      withNs.join(broadcast(prefixTable), withNs("__ns") === prefixTable("namespace"), "left")
        .withColumn(c,
          when(col("__ns").isNull, col(c)).otherwise(concat(
            // typed literals keep everything up to and incl. the last '^'
            when(col(c).contains("^^"), upToLast(col(c), "^")).otherwise(lit("")),
            col("prefix"), lit(":"),
            substring(tgt(col(c)), length(col("__ns")) + 1, length(tgt(col(c)))))))
        .drop("__ns", "prefix", "namespace")
    }
    (cols.foldLeft(triples)(compact), prefixTable)
  }
}
