package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions injector: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers the native
  * codegen expressions as permanent SQL functions in every session built
  * against the config — the deployment-grade registration path (the
  * library also self-registers temp functions lazily via
  * [[functions.VectorExpressions.register]] for ad-hoc sessions, same
  * builders). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.DotProduct(exprs(0), exprs(1))))
  }
}
