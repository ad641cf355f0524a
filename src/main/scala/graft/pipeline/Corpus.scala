package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic interleaved-docs corpus generator (FIXTURES.md §2).
 *
 * Every doc is a pure function of its index (`Random(seed + idx)`), so the
 * corpus is identical regardless of partitioning or parallelism — the
 * property that lets the same generator back correctness tests at D=10³
 * and throughput benches at D=10⁶ without materializing data. Generation
 * happens on the executors via `spark.range(n).mapPartitions` (no driver
 * collect, no external data).
 *
 * Skew is intentional: subjects are drawn from a small head set
 * (E_0..E_9) with probability ~1/2, giving the power-law head entities
 * the north rule requires the pipeline to handle via salting/AQE.
 */
object Corpus {

  /** Relation vocabulary — mirrors the reference fixture KB so rule mining
    * over the constructed graph finds the same shapes
    * (reference: kb/src/test/java/amie/data/B_KBTest.java:16-27). */
  val relations: Seq[String] =
    Seq("wasBornIn", "livesIn", "worksAt", "isLocatedIn", "type")

  val HeadEntities = 10 // E_0..E_9 get ~half of all subject slots

  /** The three alias surface forms of entity i (canonicalization work). */
  def aliasForms(i: Int): Seq[String] = Seq(s"E_$i", s"e_$i", s"E $i")

  /** The canonical representative = lexicographically smallest alias of the
    * component ("E i" < "E_i" < "e_i" in ASCII). The connected-components
    * stage must converge to exactly this choice. */
  def canonicalAlias(i: Int): String = aliasForms(i).min

  /** Planted entity-level structure (deterministic functions of the
    * entity index) so that rule mining over the constructed graph finds a
    * real Horn rule: `worksAt(x,t) ∧ isLocatedIn(t,c) ⇒ livesIn(x,c)`
    * holds by construction, `wasBornIn`/`type` are uniform noise. */
  def orgOf(i: Int, nEntities: Int): Int  = (i * 7 + 3)  % nEntities
  def cityOf(i: Int, nEntities: Int): Int = (i * 5 + 11) % nEntities

  def generate(spark: SparkSession, nDocs: Long, nEntities: Int, seed: Long = 42L): Dataset[Doc] = {
    import spark.implicits._
    val rels = relations
    val nHead = HeadEntities
    val nEnt  = nEntities
    spark.range(nDocs).mapPartitions { it =>
      it.map { idx =>
        val rng = new scala.util.Random(seed + idx)
        def entity(): Int =
          if (rng.nextBoolean()) rng.nextInt(math.min(nHead, nEnt))
          else rng.nextInt(nEnt)
        def alias(i: Int): String = aliasForms(i)(rng.nextInt(3))
        val nSpans = 1 + rng.nextInt(8)
        var offset = 0
        val spans = (0 until nSpans).map { k =>
          if (rng.nextInt(3) == 0) { // media span: opaque ref, no text
            val s = Span("media", None, Some(s"m://doc$idx/$k"), offset)
            offset += 16
            s
          } else {
            val s0  = entity()
            val rel = rels(rng.nextInt(rels.size))
            val o = rel match {
              case "worksAt"     => orgOf(s0, nEnt)
              case "isLocatedIn" => cityOf(s0, nEnt)
              case "livesIn"     => cityOf(orgOf(s0, nEnt), nEnt)
              case _             => rng.nextInt(nEnt) // wasBornIn / type: noise
            }
            val text = s"${alias(s0)} $rel ${alias(o)}."
            val s    = Span("text", Some(text), None, offset)
            offset += text.length + 1
            s
          }
        }
        Doc(s"doc$idx", spans)
      }
    }
  }

  /**
   * Reference-oracle extraction: the per-doc pure function the pipeline
   * must agree with (P/R ≥ 0.95 per BASELINE.json; here exactly 1.0).
   * Text spans parse as `<alias> <relation> <alias>.`; aliases resolve to
   * the lexicographically-minimal surface form of their entity; media
   * spans emit nothing.
   */
  def oracleTriples(doc: Doc): Seq[(String, String, String)] = {
    val relAlt = relations.map(java.util.regex.Pattern.quote).mkString("|")
    val P      = java.util.regex.Pattern.compile(s"^(.+?) ($relAlt) (.+?)\\.$$")
    def canon(alias: String): String = {
      val norm = alias.toLowerCase.replaceAll("[ _]", "")
      // all three forms share the stripped key; pick the global min form
      val i = norm.stripPrefix("e").toInt
      canonicalAlias(i)
    }
    doc.spans.filter(_.kind == "text").flatMap { sp =>
      val m = P.matcher(sp.text.getOrElse(""))
      if (m.matches()) Some((canon(m.group(1)), m.group(2), canon(m.group(3))))
      else None
    }
  }
}
