package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over `array<float>` embedding columns, built
  * on the native [[DotProd]] Catalyst expression (single tight loop
  * per row — no UDF serialization, no interpreted per-element lambda).
  * Arithmetic accumulates in double left-to-right so results are
  * bit-stable and match the DuckDB oracle (`list_cosine_similarity`
  * on DOUBLE[]).
  */
object VectorFunctions {

  import org.apache.spark.sql.GraftSqlShims

  def dot(a: Column, b: Column): Column =
    GraftSqlShims.column(DotProd(
      GraftSqlShims.expression(a), GraftSqlShims.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Signed random-hyperplane LSH signature: one bit per plane,
    * packed into a long. Planes are a deterministic constant (seeded),
    * so signatures are reproducible across runs and executors. Native
    * [[HyperplaneSigExpr]] kernel — the plane matrix is a plan
    * reference object, so 64 planes plan as cheaply as 16.
    */
  def hyperplaneSig(v: Column, planes: Array[Array[Double]]): Column =
    GraftSqlShims.column(HyperplaneSigExpr(GraftSqlShims.expression(v), planes))

  /** Indices of the `p` nearest centroids by cosine, descending. */
  def topCentroidIds(v: Column, cents: Array[Array[Double]], p: Int): Column =
    GraftSqlShims.column(TopCentroidIds(GraftSqlShims.expression(v), cents, p))

  /** Deterministic pseudo-gaussian hyperplanes (fixed seed). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
