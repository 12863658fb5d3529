package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.DotProduct

/** Installable Spark extension: `--conf
  * spark.sql.extensions=graft.GraftExtensions` (or `.withExtensions`)
  * registers the engine's custom expressions in every session built from
  * that context — the deployment path for a cluster where users' SQL
  * should see `graft_dot` without calling a Scala API first.
  *
  * The per-session [[DotProduct.register]] remains for notebook use on an
  * already-running session (extensions only apply at session build time).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_hashed_embedding"),
      new ExpressionInfo(
        classOf[graft.expressions.HashedEmbedding].getCanonicalName,
        "graft_hashed_embedding"),
      // ONE validated builder shared with the per-session register()
      // path: both reject a non-literal / fractional / out-of-range `d`
      // with the same clear message instead of an opaque
      // ClassCastException (or a silent 64.9 -> 64 truncation)
      graft.expressions.HashedEmbedding.fromSql _))
    ext.injectFunction((
      FunctionIdentifier("graft_byte_entropy"),
      new ExpressionInfo(
        classOf[graft.expressions.ByteEntropy].getCanonicalName,
        "graft_byte_entropy"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.ByteEntropy(exprs(0))))
  }
}
