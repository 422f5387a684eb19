package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The 16-bit weighted-vote SimHash of a token array (Charikar, STOC
  * 2002), in one pass from inside whole-stage codegen: per token, each
  * bit of [[TokenHash]] votes +1/-1; a fingerprint bit is set where the
  * vote sum is positive.
  *
  * Folding the fingerprint into the scan is what makes q67/q231 map-only
  * on the derivation side: the composable form — explode tokens, agg
  * (doc, hash) term frequencies, explode x16 bit indices, agg votes, agg
  * the fingerprint — pays THREE corpus-keyed shuffles for what is
  * per-row arithmetic (tf-weighting distributes over instances: summing
  * ±1 per token instance equals summing ±tf per distinct hash, so no
  * frequency pre-agg is needed). The DuckDB oracle still replays the
  * exploded tf-weighted formulation (`Text.simhashCtesSql`), and the SQL
  * twin keeps it too — the kernel is hash-pinned against an independent
  * derivation in both engines.
  *
  * Null tokens hash as 0 (the analyzer never emits them); a vote tie
  * leaves the bit clear, matching the oracle's `s > 0` test.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash16.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash16.of($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

object SimHash16 {
  /** Static entry shared by generated Java and interpreted eval. */
  def of(arr: ArrayData): Long = {
    val votes = new Array[Long](16)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else TokenHash.hash(arr.getUTF8String(i))
      var b = 0
      while (b < 16) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}
