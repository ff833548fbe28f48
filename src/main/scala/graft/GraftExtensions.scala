package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{Dist2Expr, DotExpr, Hash60Expr, NgramHashExpr, SimHash60Expr, TokenHashExpr, WinnowSketchExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so SQL users get them too (`SELECT hash60(col) ...`,
  * `SELECT vec_dot(a, b) ...`). Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (GraftSession does).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer: prune unused min_by/max_by struct-payload fields (the
    // per-key dedup family's carry-along columns) — stock column pruning
    // stops at the aggregate boundary; see the rule's scaladoc
    ext.injectOptimizerRule(_ => graft.plans.MinMaxByPayloadPruning)
    ext.injectFunction((
      new FunctionIdentifier("hash60"),
      new ExpressionInfo(classOf[Hash60Expr].getName, "hash60"),
      (children: Seq[Expression]) => Hash60Expr(children.head)))
    def binary(name: String, mk: (Expression, Expression) => Expression)
        (children: Seq[Expression]): Expression = children match {
      case Seq(a, b) => mk(a, b)
      case other => throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${other.size}")
    }
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "vec_dot"),
      binary("vec_dot", DotExpr.apply) _))
    ext.injectFunction((
      new FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[Dist2Expr].getName, "vec_dist2"),
      binary("vec_dist2", Dist2Expr.apply) _))
    // (array, width)-shaped functions where the width is a plan-time
    // parameter, not a per-row value: demand a foldable INTEGRAL literal.
    def arrayWithWidth(name: String, mk: (Expression, Int) => Expression)
        (children: Seq[Expression]): Expression = children match {
      case Seq(arr, w) if w.foldable => w.eval() match {
        // range-check before narrowing: intValue() on a BIGINT literal
        // silently wraps (width 2^32+1 would become 1); fractional
        // literals (2.5) must error, not silently truncate to 2
        case n: Number if n.doubleValue() == n.longValue() &&
            n.longValue() >= 1 && n.longValue() <= Int.MaxValue =>
          mk(arr, n.intValue())
        case bad => throw new IllegalArgumentException(
          s"$name width must be an integral literal in [1, ${Int.MaxValue}], got $bad")
      }
      case Seq(_, _) => throw new IllegalArgumentException(
        s"$name width must be a foldable literal, not a per-row expression")
      case other => throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments (array<bigint>, width), got ${other.size}")
    }
    ext.injectFunction((
      new FunctionIdentifier("winnow_sketch"),
      new ExpressionInfo(classOf[WinnowSketchExpr].getName, "winnow_sketch"),
      arrayWithWidth("winnow_sketch", WinnowSketchExpr.apply) _))
    // shingle_hashes = distilled (distinct, short-doc-padded) gram hashes;
    // gram_hashes = positional per-occurrence form (empty below n tokens)
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[NgramHashExpr].getName, "shingle_hashes"),
      arrayWithWidth("shingle_hashes", NgramHashExpr(_, _, distilled = true)) _))
    ext.injectFunction((
      new FunctionIdentifier("gram_hashes"),
      new ExpressionInfo(classOf[NgramHashExpr].getName, "gram_hashes"),
      arrayWithWidth("gram_hashes", NgramHashExpr(_, _, distilled = false)) _))
    // token_hashes = per-element pmod(hash60, P); token_fold_hash = the
    // Rabin-Karp rolling fold of the same hashes (one long per array)
    def unary(name: String, mk: Expression => Expression)
        (children: Seq[Expression]): Expression = children match {
      case Seq(c) => mk(c)
      case other => throw new IllegalArgumentException(
        s"$name requires exactly 1 argument (array<string>), got ${other.size}")
    }
    ext.injectFunction((
      new FunctionIdentifier("token_hashes"),
      new ExpressionInfo(classOf[TokenHashExpr].getName, "token_hashes"),
      unary("token_hashes", TokenHashExpr(_, fold = false)) _))
    ext.injectFunction((
      new FunctionIdentifier("token_fold_hash"),
      new ExpressionInfo(classOf[TokenHashExpr].getName, "token_fold_hash"),
      unary("token_fold_hash", TokenHashExpr(_, fold = true)) _))
    // simhash60(tokens): the one-pass count-weighted 60-bit signature
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60Expr].getName, "simhash60"),
      unary("simhash60", SimHash60Expr(_: Expression)) _))
  }
}
