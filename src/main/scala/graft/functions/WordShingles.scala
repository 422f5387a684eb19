package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-word shingles of a token array: `["a","b","c","d"], k=3` ->
  * `["a b c", "b c d"]` (empty for arrays shorter than k).
  *
  * The composable form — `transform(sequence(0, size-k), i ->
  * concat_ws(' ', element_at(ws, i+1), ...))` — evaluates a Catalyst tree
  * per shingle per element; this expression builds the shingle array in
  * one static helper call from inside whole-stage codegen. The shingle
  * set is the input to BOTH near-dup paths (exact Jaccard and
  * MinHash-LSH), so at 100 TB this loop runs once per document on the
  * scan side of a shuffle.
  *
  * k is a compile-time literal (part of the expression), matching how the
  * analyzer chain is configured, not data-dependent. */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(s"k must be >= 1, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.build(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.build($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  private val space = UTF8String.fromString(" ")

  /** Static entry shared by generated Java and interpreted eval. Null
    * tokens are treated as empty strings (the analyzer never emits them). */
  def build(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val out = n - k + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val res = new Array[Any](out)
    i = 0
    while (i < out) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      res(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }
}
