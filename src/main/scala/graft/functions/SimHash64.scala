package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The PRODUCTION-WIDTH 64-bit weighted-vote SimHash (Charikar, STOC
  * 2002) of a token array — [[SimHash16]]'s vote over all 64 bits of
  * [[TokenHash]], in one pass from inside whole-stage codegen (same
  * map-only posture; the 16-bit kernel's scaladoc carries the derivation
  * argument).
  *
  * This is the width SURVEY Q231 documents for a corpus past ~2^16 docs:
  * near-dup blocking probes the fingerprint in 4 exact-key 16-bit blocks
  * (Manku/Jain/Sarma, WWW 2007 — hamming <= 3 over 64 bits forces at
  * least one of 4 disjoint blocks to match exactly), then verifies the
  * (tiny) candidate set with one bit_count. q284 executes that plan and
  * its spec pins radius-exactness plus block-bucket occupancy.
  *
  * The per-token hash is [[TokenHash]] passed through the splitmix64
  * avalanche finalizer (Steele/Lea/Flood, OOPSLA 2014 — the public
  * java.util.SplittableRandom mixer): the base hash is modular
  * arithmetic below 2^30, so voting on it directly would leave bits
  * 30-63 permanently clear and collapse two of the four Manku blocks
  * into a constant key (an all-pairs join). The mixer spreads the same
  * deterministic base hash across all 64 bits; SimHash16 keeps the raw
  * base hash, so the two widths are independent fingerprints, not a
  * prefix relation.
  *
  * Null tokens hash as 0 (the analyzer never emits them); a vote tie
  * leaves the bit clear, matching the 16-bit kernel.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.of(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.of($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** splitmix64 finalizer — spreads the modular base hash over 64 bits. */
  def mix(z0: Long): Long = {
    var z = (z0 ^ (z0 >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Static entry shared by generated Java and interpreted eval. */
  def of(arr: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else mix(TokenHash.hash(arr.getUTF8String(i)))
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= (1L << b)
      b += 1
    }
    sh
  }
}
