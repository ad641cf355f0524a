package graft

import graft.expressions.RegexpExtractGroups
import graft.pipeline.{Corpus, MentionDetect}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native codegen expressions: semantics vs the built-ins they replace,
  * on both the codegen and interpreted paths. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pat = "^(.+?) (works|lives) (.+?)\\.$"

  test("regexp_extract_groups equals per-group regexp_extract on matches, null otherwise") {
    val df = Seq(
      "A B works C D.",     // match with multi-word groups
      "E 7 lives X_2.",     // match
      "no relation here",   // no match
      "works .",            // no match (empty groups not allowed by .+?)
      "").toDF("s")
    val got = df.select(
      RegexpExtractGroups(col("s"), pat).as("g"),
      regexp_extract(col("s"), pat, 1).as("e1"),
      regexp_extract(col("s"), pat, 2).as("e2"),
      regexp_extract(col("s"), pat, 3).as("e3")).collect()
    got.foreach { r =>
      if (r.isNullAt(0)) {
        // built-in returns "" for non-matching rows
        assert(r.getString(1) == "" && r.getString(3) == "")
      } else {
        val g = r.getSeq[String](0)
        assert(g == Seq(r.getString(1), r.getString(2), r.getString(3)))
      }
    }
    assert(got.count(_.isNullAt(0)) == 3)
  }

  test("interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = RegexpExtractGroups(BoundReference(0, StringType, nullable = true), Literal(pat))
    val hit = e.eval(InternalRow(UTF8String.fromString("A B works C D.")))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(hit.numElements() == 3)
    assert(hit.getUTF8String(1).toString == "works")
    assert(e.eval(InternalRow(UTF8String.fromString("nope"))) == null)
    assert(e.eval(InternalRow(null)) == null)
  }

  test("null capture groups surface as null array elements") {
    val df = Seq("ab").toDF("s")
    val r = df.select(RegexpExtractGroups(col("s"), "^(a)(x)?(b)$").as("g")).collect()(0)
    val g = r.getSeq[String](0)
    assert(g == Seq("a", null, "b"))
  }

  test("hyperplane signs: driver-precomputed literal equals the md5 formula, incl. beyond the precomputed dim") {
    // lshBucket's planeDot hoists the (plane, index) md5 sign matrix to a
    // driver-side string literal (r6 optimization); this differential pins
    // it to the original in-plan md5 expression, with a 600-dim embedding
    // so components past MaxPrecomputedDim (512) exercise the fallback.
    val dim = 600
    val emb = (1 to 5).map { v =>
      (v.toLong, Array.tabulate(dim)(i => ((v * 31 + i * 7) % 13 - 6).toFloat / 3f))
    }.toDF("vec_id", "embedding")
    val planes = 4
    def md5PlaneDot(j: Int) = expr(
      s"""aggregate(zip_with(embedding, sequence(1, size(embedding)), (x, i) ->
         |  (case when cast(conv(substring(md5(concat('$j', '_', cast(i as string))), 1, 2), 16, 10) as bigint) % 2 = 1
         |        then 1.0D else -1.0D end) * cast(x as double)),
         |  0D, (acc, v) -> acc + v)""".stripMargin.replace("\n", " "))
    val reference = emb.withColumn("bucket",
      (0 until planes)
        .map(j => when(md5PlaneDot(j) >= 0, lit(1L << j)).otherwise(0L))
        .reduce(_ + _))
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.functions.Similarity.lshBucket(emb, planes)
      .select("vec_id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference)
  }

  test("mention detection via the fused expression matches the 3x-regexp_extract form") {
    val docs = Corpus.generate(spark, 500, 40).toDF()
    val p = {
      val relAlt = Corpus.relations.map(java.util.regex.Pattern.quote).mkString("|")
      s"^(.+?) ($relAlt) (.+?)\\.$$"
    }
    val legacy = docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("span_idx", "span")))
      .where(col("span.kind") === "text")
      .select(col("doc_id"), col("span_idx"),
        regexp_extract(col("span.text"), p, 1).as("subj_alias"),
        regexp_extract(col("span.text"), p, 2).as("rel"),
        regexp_extract(col("span.text"), p, 3).as("obj_alias"))
      .where(col("rel") =!= "")
    val fused = MentionDetect.mentions(docs)
    assert(fused.exceptAll(legacy).isEmpty && legacy.exceptAll(fused).isEmpty)
    assert(fused.count() > 0)
  }
}
