package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd vector/text kernels — the hot inner loops of the similarity
  * and fingerprint operators (SURVEY.md §4.2 "custom work" rows).
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * is correct but interpreted: every element is a Catalyst tree eval with
  * boxing, and it materializes the zipped intermediate array. These
  * expressions run the loop over primitive `ArrayData` slots inside
  * whole-stage codegen — no allocation, no boxing — which is the
  * difference between an O(pairs x dim) candidate-verify step that
  * dominates a near-dup job at 100 TB and one that disappears into the
  * scan.
  *
  * Null semantics: null input array -> null result (nullIntolerant);
  * MISMATCHED lengths -> null (a partial dot product over a corrupt row
  * would be silently wrong — surface it, matching the zip_with+aggregate
  * formulation these kernels replaced); null *elements* are treated as
  * 0.0, matching `aggregate`'s `+` over null.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot product and both L2 norms in ONE pass over
  * the arrays. Equivalent to `vec_dot(a,b)/(sqrt(vec_dot(a,a))*sqrt(vec_dot(b,b)))`
  * at a third of the memory traffic. Zero-norm input -> NaN (same as the
  * composed form and DuckDB's list_cosine_similarity). */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "vec_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Cross-engine deterministic token hash: fold `h = (h*31 + codepoint) % p`
  * (p = 1e9+7) over the string's characters — the rolling hash the
  * fingerprint/SimHash operators share with their DuckDB oracles
  * (`Text.tokenHashSql`). Codegen'd replacement for the interpreted
  * `aggregate(split(tok, ""), ...)` per-character tree eval.
  *
  * Matches the oracle exactly for ASCII text (the analyzer lowercases and
  * strips to [a-z0-9] first, so inputs are ASCII by construction); for
  * non-ASCII input it folds over Unicode code points. */
case class TokenHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash =
    copy(child = newChild)
}

object TokenHash {
  final val Mod = 1000000007L

  /** Static entry so generated Java and interpreted eval share one body. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** Column-API handles for the kernels. Resolution goes through the session
  * FunctionRegistry (`call_function`, public API) — every GraftSession
  * registers the names via [[GraftExtensions]], and the SQL entry path gets
  * the same functions for free. */
object vec {
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("vec_cosine", a, b)
  def tokenHash(t: Column): Column = call_function("token_hash", t)
  def simhash16(toks: Column): Column = call_function("simhash16", toks)
  def simhash64(toks: Column): Column = call_function("simhash64", toks)
  def wordShingles(toks: Column, k: Int): Column =
    call_function("word_shingles", toks, org.apache.spark.sql.functions.lit(k))
}
