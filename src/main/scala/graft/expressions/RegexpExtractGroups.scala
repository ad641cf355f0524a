package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ALL capture groups of one anchored regex match in a single pass —
 * `array(group1, …, groupN)`, or NULL when the subject does not match.
 *
 * Spark's built-in `regexp_extract(s, p, i)` runs one full regex match
 * per requested group, so pulling k groups from the same pattern costs k
 * matches of the same string (mention detection needs 3). This native
 * expression keeps the whole-stage-codegen property of the built-in
 * (no UDF, no interpreted fallback) and matches once.
 *
 * The pattern must be a foldable literal — it is compiled once on the
 * driver and shipped via the codegen reference array, exactly like the
 * cached `lastRegex` of Spark's own RegExpExtractBase.
 */
final case class RegexpExtractGroups(subject: Expression, regexp: Expression)
    extends BinaryExpression {

  require(regexp.foldable, "RegexpExtractGroups requires a literal pattern")

  override def left: Expression  = subject
  override def right: Expression = regexp
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean  = true
  override def prettyName: String = "regexp_extract_groups"

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(String.valueOf(right.eval()))

  override def nullSafeEval(s: Any, r: Any): Any = {
    val m = pattern.matcher(s.asInstanceOf[UTF8String].toString)
    if (!m.matches()) null
    else {
      val n   = m.groupCount()
      val arr = new Array[Any](n)
      var i = 0
      while (i < n) {
        val g = m.group(i + 1)
        if (g != null) arr(i) = UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(arr)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("graftPattern", pattern,
      classOf[java.util.regex.Pattern].getName)
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val m   = ctx.freshName("matcher")
      val arr = ctx.freshName("groups")
      val i   = ctx.freshName("i")
      val g   = ctx.freshName("g")
      s"""
         |java.util.regex.Matcher $m = $patRef.matcher($s.toString());
         |if ($m.matches()) {
         |  int ${i}n = $m.groupCount();
         |  Object[] $arr = new Object[${i}n];
         |  for (int $i = 0; $i < ${i}n; $i++) {
         |    String $g = $m.group($i + 1);
         |    if ($g != null) {
         |      $arr[$i] = org.apache.spark.unsafe.types.UTF8String.fromString($g);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpExtractGroups =
    copy(subject = newLeft, regexp = newRight)
}

object RegexpExtractGroups {
  /** Column API: one-match extraction of every capture group. */
  def apply(subject: Column, pattern: String): Column =
    GraftColumnBridge.column(
      RegexpExtractGroups(GraftColumnBridge.expression(subject), Literal(pattern)))
}
