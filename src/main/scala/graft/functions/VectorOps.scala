package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` / `array<double>` columns.
  *
  * The per-pair hot loops (`dot`, `dist2`, `norm2`) are native codegen'd
  * Catalyst expressions (`DotExpr`/`Dist2Expr` — tight primitive loops
  * inside whole-stage codegen). The higher-order-function twins
  * (`dotHof`/`dist2Hof`) remain as the SQL-portable formulation the DuckDB
  * oracle mirrors; FunctionsSpec asserts the two are bit-identical.
  *
  * Elements are cast to double BEFORE any arithmetic: float->double is exact,
  * and both engines then accumulate in double left-to-right, which keeps the
  * oracle bit-compatible.
  */
object VectorOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}

  /** Cast array<float> -> array<double> (exact). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = toCol(DotExpr(toExpr(a), toExpr(b)))

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared euclidean distance. */
  def dist2(a: Column, b: Column): Column = toCol(Dist2Expr(toExpr(a), toExpr(b)))

  /** Builtin-only HOF twin of `dot` (what the SQL oracle mirrors). */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Builtin-only HOF twin of `dist2`. */
  private[graft] def dist2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

  /** Scala twin of GraftFunctions.hash60 for plan-build-time constants. */
  private def hash60Scala(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Random-hyperplane LSH bucket id over `nPlanes` deterministic
    * pseudo-random hyperplanes. Plane p's coefficient for dimension d is a
    * fixed md5-derived hash of "p_d" mapped to [-1, 1) — reproducible in the
    * DuckDB oracle. The coefficient matrix is row-independent, so it is
    * computed ONCE at plan build time and shipped as array literals (the
    * round-1 version re-hashed nPlanes×dim md5s per row). Bucket = sign-bit
    * pattern packed into a long.
    */
  def lshBucket(v: Column, dim: Int, nPlanes: Int): Column = {
    require(nPlanes <= 62, "bucket packed into a long")
    val bits = (0 until nPlanes).map { p =>
      val coefs = (0 until dim).map { d =>
        (hash60Scala(s"${p}_$d") % 1000003L).toDouble / 500001.5d - 1.0d
      }
      val proj = dot(v, array(coefs.map(lit): _*))
      // null proj (null element / wrong dimension) must POISON the bucket
      // to null, not default to bit 0 — otherwise every malformed vector
      // lands together in bucket 0 as plausible ANN candidates
      when(proj >= 0, shiftleft(lit(1L), p)).when(proj < 0, lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Johnson–Lindenstrauss random projection: `dim`-dim vector -> `rpDim`
    * deterministic pseudo-random components (array<double>). Component j
    * is the dot product with a plane whose coefficient for dimension d is
    * the md5-derived hash of "rp_j_d" mapped to [-1, 1) — the same
    * construction as [[lshBucket]] but keeping the REAL projection value
    * instead of its sign bit, and in a disjoint tag domain so the two
    * plane families never coincide. The coefficient matrix is computed
    * once at plan build time and shipped as array literals. Angles (so
    * cosines) are preserved within the usual JL distortion, which is what
    * makes a projected-cosine shortlist a sound candidate generator
    * (Similarity.rpTopK).
    */
  def randomProject(v: Column, dim: Int, rpDim: Int): Column = {
    require(rpDim > 0, "need at least one projected component")
    val comps = (0 until rpDim).map { j =>
      val coefs = (0 until dim).map { d =>
        (hash60Scala(s"rp_${j}_$d") % 1000003L).toDouble / 500001.5d - 1.0d
      }
      dot(v, array(coefs.map(lit): _*))
    }
    array(comps: _*)
  }
}
