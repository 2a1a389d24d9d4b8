package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Distributed top-`p` centroid assignment — the k-scalable twin of
    * [[topCentroidIds]]. Past a few thousand centroids, shipping a
    * k×dim matrix as a plan constant with every task binary stops
    * making sense; here the centroids stay a (broadcast) DataFrame,
    * every (row, centroid) score exists only transiently inside one
    * codegen span, and a per-row window keeps the top p. EXACT
    * arithmetic parity with the [[TopCentroidIds]] kernel: the same
    * sequential-fold [[DotProd]] for dot and norm, the same
    * `dot · (1/√norm)` scoring (0 for a zero centroid), NaN → −∞,
    * ties broken toward the lower centroid id — so either path yields
    * bit-identical assignments and the DuckDB oracle replica covers
    * both.
    *
    * `cents` columns: `(cid_c int, c array<double>)`.
    * Output: `(id long, rr int 1-based, cluster int)`.
    */
  def assignTopCentroids(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, probes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nc = dot(col("c"), col("c"))
    val s0 = dot(col(vecCol), col("c")) *
      when(nc > 0, lit(1.0) / sqrt(nc)).otherwise(lit(0.0))
    val score = when(isnan(s0), lit(Double.NegativeInfinity)).otherwise(s0)
    val w = Window.partitionBy(idCol).orderBy(col("__score").desc, col("cid_c"))
    df.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cents))
      .withColumn("__score", score)
      .withColumn("rr", row_number().over(w))
      .filter(col("rr") <= probes)
      .select(col(idCol).cast("long").as("id"), col("rr").cast("int").as("rr"),
        col("cid_c").cast("int").as("cluster"))
  }

  /** Deterministic pseudo-gaussian hyperplanes (fixed seed). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
