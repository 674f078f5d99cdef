package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{MinHashSignature, SimHash64, WordShingles}

/** Library packaging: install every graft extension into a session.
  *
  * Two entry points, the standard pair for Spark extension libraries:
  *  - config-time: `spark.sql.extensions=graft.plans.GraftExtensions`
  *    (class instantiated by Spark before the session exists);
  *  - runtime: `GraftExtensions.install(spark)` on a live session
  *    (function registry + experimental optimizer rules are the public
  *    mutable seams).
  *
  * Installed surface: the compiled text expressions as SQL functions and
  * [[BandedRangeJoinRule]], which rewrites `abs(l - r) <= w` cartesian
  * joins into bucketed equi-joins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.wordShinglesDesc)
    ext.injectFunction(GraftExtensions.minhashSignatureDesc)
    ext.injectFunction(GraftExtensions.simhash64Desc)
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private[plans] val wordShinglesDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "_FUNC_(text, n) - distinct word n-gram shingles"),
      exprs => WordShingles(exprs.head, exprs(1).eval().asInstanceOf[Int]))

  private[plans] val minhashSignatureDesc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature",
        "_FUNC_(text, n, numHashes) - one-pass MinHash signature"),
      exprs => MinHashSignature(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]))

  private[plans] val simhash64Desc
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(text) - one-pass 64-bit SimHash"),
      exprs => SimHash64(exprs.head))

  /** Install on a LIVE session: SQL functions via the registry, the
    * banded-range-join rewrite via experimental optimizer rules
    * (idempotent — the rule is a singleton, added once).
    */
  def install(spark: SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val existing = spark.experimental.extraOptimizations
    if (!existing.contains(BandedRangeJoinRule)) {
      spark.experimental.extraOptimizations = existing :+ BandedRangeJoinRule
    }
  }
}
