package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's `SparkSessionExtensions` injection point (SURVEY.md §4.2):
  * registers the codegen'd kernels as SQL functions so the SQL entry path
  * (SURVEY.md §3.4 entry C) reaches them too, and injects the planner
  * seam: [[graft.plans.ExpandAnnTopK]], the resolution rule that expands
  * the [[graft.plans.AnnTopK]] logical operator into the conf-selected
  * physical route (exact cosine top-k, IVF probe, or LSH candidates).
  *
  * Activated by `spark.sql.extensions=graft.functions.GraftExtensions`
  * (set in GraftSession.configure).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], arity: Int,
                 build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
     new ExpressionInfo(clazz.getCanonicalName, name),
     (args: Seq[Expression]) => {
       require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
       build(args)
     })

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the planner seam: AnnTopK is the whole-operator logical node whose
    // physical route (exact / IVF / LSH) is a plan-time session decision
    ext.injectResolutionRule(session => graft.plans.ExpandAnnTopK(session))
    ext.injectFunction(fn("vec_dot", classOf[VecDot], 2,
      args => VecDot(args(0), args(1))))
    ext.injectFunction(fn("vec_cosine", classOf[VecCosine], 2,
      args => VecCosine(args(0), args(1))))
    ext.injectFunction(fn("token_hash", classOf[TokenHash], 1,
      args => TokenHash(args(0))))
    ext.injectFunction(fn("nfc_normalize", classOf[NfcNormalize], 1,
      args => NfcNormalize(args(0))))
    ext.injectFunction(fn("simhash16", classOf[SimHash16], 1,
      args => SimHash16(args(0))))
    ext.injectFunction(fn("simhash64", classOf[SimHash64], 1,
      args => SimHash64(args(0))))
    ext.injectFunction(fn("word_shingles", classOf[WordShingles], 2,
      args => args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
          WordShingles(args(0), k)
        case other => throw new IllegalArgumentException(
          s"word_shingles k must be an integer literal, got $other")
      }))
  }
}
