package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Hash60Expr

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so SQL users get them too (`SELECT hash60(col) ...`).
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (children: Seq[Expression]) => Hash60Expr(children.head)))
  }
}
