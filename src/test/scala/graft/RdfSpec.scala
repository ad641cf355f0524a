package graft

import graft.sources.RdfFacts
import org.scalatest.funsuite.AnyFunSuite

/** Turtle / N-Triples loading + namespace compaction (SURVEY.md §2.1,
  * reference KB.java:228-247 + StoreStatementToKB.java:10-69). */
class RdfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def write(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rdf")
    val f   = dir.resolve(name)
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("N-Triples: line parse, comments, literals with lang/type") {
    val nt =
      """# a comment
        |<http://ex.org/Luis> <http://ex.org/livesIn> <http://ex.org/Paris> .
        |
        |<http://ex.org/Luis> <http://ex.org/name> "Luis G."@es .
        |<http://ex.org/Paris> <http://ex.org/pop> "2e6"^^<http://www.w3.org/2001/XMLSchema#double> .
        |_:b0 <http://ex.org/knows> <http://ex.org/Luis> .
        |""".stripMargin
    val got = RdfFacts.loadNTriples(spark, write("f.nt", nt))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://ex.org/Luis", "http://ex.org/livesIn", "http://ex.org/Paris"),
      ("http://ex.org/Luis", "http://ex.org/name", "\"Luis G.\"@es"),
      ("http://ex.org/Paris", "http://ex.org/pop",
        "\"2e6\"^^<http://www.w3.org/2001/XMLSchema#double>"),
      ("_:b0", "http://ex.org/knows", "http://ex.org/Luis")))
  }

  test("Turtle subset: prefixes, a-keyword, semicolon/comma continuation") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |@prefix foaf: <http://xmlns.com/foaf/0.1/> .
        |# people
        |ex:Luis a foaf:Person ;
        |  foaf:knows ex:Thomas , ex:Antoine ;
        |  foaf:name "Luis" .
        |ex:Thomas foaf:age "30"^^<http://www.w3.org/2001/XMLSchema#int> .
        |""".stripMargin
    val got = RdfFacts.loadTurtle(spark, write("f.ttl", ttl))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      ("http://ex.org/Luis", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://xmlns.com/foaf/0.1/Person"),
      ("http://ex.org/Luis", "http://xmlns.com/foaf/0.1/knows", "http://ex.org/Thomas"),
      ("http://ex.org/Luis", "http://xmlns.com/foaf/0.1/knows", "http://ex.org/Antoine"),
      ("http://ex.org/Luis", "http://xmlns.com/foaf/0.1/name", "\"Luis\""),
      ("http://ex.org/Thomas", "http://xmlns.com/foaf/0.1/age",
        "\"30\"^^<http://www.w3.org/2001/XMLSchema#int>")))
  }

  test("Turtle: prefixed datatypes expand; bare numeric/boolean literals parse") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ex:Thomas ex:age "30"^^xsd:int ;
        |  ex:pop 2e6 ;
        |  ex:height 1.85 ;
        |  ex:count 42 ;
        |  ex:active true .
        |""".stripMargin
    val got = RdfFacts.loadTurtle(spark, write("d.ttl", ttl))
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    assert(got("http://ex.org/age") == s""""30"^^<${xsd}int>""")
    assert(got("http://ex.org/pop") == s""""2e6"^^<${xsd}double>""")
    assert(got("http://ex.org/height") == s""""1.85"^^<${xsd}decimal>""")
    assert(got("http://ex.org/count") == s""""42"^^<${xsd}integer>""")
    assert(got("http://ex.org/active") == s""""true"^^<${xsd}boolean>""")
  }

  test("Turtle: blank-node property lists, nested and as anonymous subject") {
    val ttl =
      """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
        |@prefix ex: <http://ex.org/> .
        |ex:Luis foaf:knows [ foaf:name "T" ; foaf:knows [ foaf:name "A" ] ] .
        |[ foaf:name "X" ] .
        |""".stripMargin
    val got = RdfFacts.loadTurtle(spark, write("bnodes.ttl", ttl))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val foaf = "http://xmlns.com/foaf/0.1/"
    // structure: Luis --knows--> b1 --name--> "T", b1 --knows--> b2 --name--> "A"
    val b1 = got.collect { case ("http://ex.org/Luis", p, o) if p == s"${foaf}knows" => o }
    assert(b1.length == 1 && b1.head.startsWith("_:g"), got.mkString("\n"))
    assert(got.contains((b1.head, s"${foaf}name", "\"T\"")))
    val b2 = got.collect { case (s, p, o) if s == b1.head && p == s"${foaf}knows" => o }
    assert(b2.length == 1 && b2.head.startsWith("_:g") && b2.head != b1.head)
    assert(got.contains((b2.head, s"${foaf}name", "\"A\"")))
    // anonymous-subject statement: one more distinct bnode carrying name "X"
    val bx = got.collect { case (s, p, "\"X\"") if p == s"${foaf}name" => s }
    assert(bx.length == 1 && bx.head.startsWith("_:g") &&
      !Set(b1.head, b2.head).contains(bx.head))
    assert(got.length == 5)
  }

  test("Turtle: collections lower to rdf:first/rest/nil chains") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |ex:l ex:items (ex:a 2 ex:b) .
        |ex:l ex:none () .
        |""".stripMargin
    val got = RdfFacts.loadTurtle(spark, write("coll.ttl", ttl))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    val xsd = "http://www.w3.org/2001/XMLSchema#"
    // empty collection: the object IS rdf:nil, no fresh nodes
    assert(got.contains(("http://ex.org/l", "http://ex.org/none", s"${rdf}nil")))
    // 3-element chain: follow rest-pointers from the items object
    val n1 = got.collect { case ("http://ex.org/l", "http://ex.org/items", o) => o }.head
    def first(n: String) = got.collect { case (s, p, o) if s == n && p == s"${rdf}first" => o }.head
    def rest(n: String)  = got.collect { case (s, p, o) if s == n && p == s"${rdf}rest" => o }.head
    assert(first(n1) == "http://ex.org/a")
    val n2 = rest(n1)
    assert(first(n2) == s""""2"^^<${xsd}integer>""")
    val n3 = rest(n2)
    assert(first(n3) == "http://ex.org/b" && rest(n3) == s"${rdf}nil")
    assert(Seq(n1, n2, n3).distinct.length == 3 && n1.startsWith("_:g"))
    assert(got.length == 2 + 6) // 2 statements + 3 (first,rest) pairs
  }

  test("Turtle: long and single-quoted literals normalize to the NT form") {
    val ttl =
      "@prefix ex: <http://ex.org/> .\n" +
        "ex:a ex:note \"\"\"line1\nline2 \"quoted\" end\"\"\"@en .\n" +
        "ex:a ex:s 'it\\'s' .\n" +
        "ex:a ex:t '''tab\there'''^^ex:dt .\n"
    val got = RdfFacts.loadTurtle(spark, write("lit.ttl", ttl))
      .collect().map(r => (r.getString(1), r.getString(2))).toMap
    assert(got("http://ex.org/note") == "\"line1\\nline2 \\\"quoted\\\" end\"@en")
    assert(got("http://ex.org/s") == "\"it's\"")
    assert(got("http://ex.org/t") == "\"tab\\there\"^^<http://ex.org/dt>")
  }

  test("Turtle: bnode labels are deterministic per run and distinct across files") {
    val ttl =
      """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
        |[ foaf:name "X" ] .
        |""".stripMargin
    val dir = java.nio.file.Files.createTempDirectory("graft-rdf-multi")
    java.nio.file.Files.write(dir.resolve("a.ttl"), ttl.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.ttl"), ttl.getBytes("UTF-8"))
    def load() = RdfFacts.loadTurtle(spark, dir.toString)
      .collect().map(r => r.getString(0)).sorted.toSeq
    val subjects = load()
    // same content, different files: two triples, DISTINCT bnode subjects
    assert(subjects.length == 2 && subjects.distinct.length == 2)
    assert(subjects.forall(_.startsWith("_:g")))
    assert(load() == subjects) // deterministic across runs
  }

  test("N-Triples strict mode rejects malformed lines; lax mode drops them") {
    val nt =
      """<http://ex.org/a> <http://ex.org/p> <http://ex.org/b> .
        |this line is garbage
        |""".stripMargin
    val p = write("bad.nt", nt)
    assert(RdfFacts.loadNTriples(spark, p).count() == 1)
    val e = intercept[IllegalArgumentException] {
      RdfFacts.loadNTriples(spark, p, strict = true)
    }
    assert(e.getMessage.contains("garbage"))
  }

  test("compaction handles the loaders' bracketed datatype form") {
    import spark.implicits._
    val (compacted, prefixes) = RdfFacts.compactIris(Seq(
      ("http://ex.org/people#Luis", "http://ex.org/rel/age",
        "\"30\"^^<http://www.w3.org/2001/XMLSchema#int>")).toDF("subj", "pred", "obj"))
    val pm  = prefixes.collect().map(r => r.getString(1) -> r.getString(0)).toMap
    val row = compacted.collect()(0)
    // datatype IRI is unbracketed + compacted; namespaces carry no '<'
    assert(pm.keys.forall(!_.contains("<")), pm.keys.mkString(", "))
    assert(row.getString(2) == s""""30"^^${pm("http://www.w3.org/2001/XMLSchema#")}:int""")
  }

  test("namespace compaction: deterministic prefixes, reference exceptions") {
    import spark.implicits._
    val triples = Seq(
      ("http://ex.org/people#Luis", "http://ex.org/rel/livesIn", "http://ex.org/cities#Paris"),
      ("http://ex.org/people#Luis", "http://ex.org/rel/name", "\"Luis\""), // plain literal: untouched
      ("http://ex.org/people#Luis", "http://ex.org/rel/site", "http://ex.org/"), // ends in '/': untouched
      ("http://ex.org/people#Luis", "http://ex.org/rel/age",
        "\"30\"^^http://www.w3.org/2001/XMLSchema#int")) // typed: IRI part compacted
      .toDF("subj", "pred", "obj")
    val (compacted, prefixes) = RdfFacts.compactIris(triples)
    val pm = prefixes.collect().map(r => r.getString(1) -> r.getString(0)).toMap
    // sorted-namespace rank: cities# < people# < rel/ < XMLSchema#
    assert(pm.keys.toSeq.sorted.zipWithIndex.forall { case (ns, i) => pm(ns) == s"p$i" })
    val rows = compacted.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val pPeople = pm("http://ex.org/people#")
    val pCities = pm("http://ex.org/cities#")
    val pRel    = pm("http://ex.org/rel/")
    val pXsd    = pm("http://www.w3.org/2001/XMLSchema#")
    assert(rows.contains((s"$pPeople:Luis", s"$pRel:livesIn", s"$pCities:Paris")))
    assert(rows.contains((s"$pPeople:Luis", s"$pRel:name", "\"Luis\"")))
    assert(rows.contains((s"$pPeople:Luis", s"$pRel:site", "http://ex.org/")))
    assert(rows.contains((s"$pPeople:Luis", s"$pRel:age", s""""30"^^$pXsd:int""")))
  }

  test("compactIris prefix ranking is scale-safe: no single-partition exchange in the plan") {
    import spark.implicits._
    // the r5 form ranked namespaces with a global row_number window — a
    // one-task sort at web scale; the rank now rides
    // Dictionary.sortedRanks (range-partitioned, output-identical)
    val (_, prefixes) = RdfFacts.compactIris(Seq(
      ("http://ex.org/people#A", "http://ex.org/rel/p", "http://ex.org/cities#B"))
      .toDF("subj", "pred", "obj"))
    val p = prefixes.queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"), s"global rank window survived:\n$p")
  }
}
