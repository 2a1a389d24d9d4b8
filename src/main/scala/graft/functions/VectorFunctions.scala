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
    * [[topCentroidIds]]. The centroid matrix rides as a BROADCAST
    * VARIABLE (one torrent-distributed copy per executor, never baked
    * into the plan), and the SAME [[TopCentroidIds]] kernel selects
    * each row's top p in one tight O(k·dim) loop — bit-identical
    * assignments by construction, so the DuckDB oracle replica covers
    * both paths. No (row, centroid) pair is ever materialized: a
    * crossJoin + per-row window would shuffle n·k rows into the
    * window exchange, which is exactly the shape this function
    * exists to avoid. (The matrix is index METADATA — k×dim doubles,
    * ≤ GBs at k=2²⁰ — the same driver-side footprint any broadcast
    * build side has; bloom sidecars, which are data-scale, must never
    * take this route.)
    *
    * `cents` columns: `(cid_c int, c array<double>)`, dense 0-based
    * ids. Output: `(id long, rr int 1-based, cluster int)`.
    */
  def assignTopCentroids(df: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, probes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val arr: Array[Array[Double]] = cents.orderBy("cid_c")
      .select("c").collect().map(_.getSeq[Double](0).toArray)
    val bc = spark.sparkContext.broadcast(arr)
    val p = math.min(probes, arr.length)
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (id, v) =>
          val ranked = TopCentroidIds.kernel(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
            cs, p, false)
          (0 until ranked.numElements()).iterator.map(i =>
            (id, i + 1, ranked.getInt(i)))
        }
      }
      .toDF("id", "rr", "cluster")
      .select(col("id"), col("rr").cast("int").as("rr"),
        col("cluster").cast("int").as("cluster"))
  }

  /** Deterministic pseudo-gaussian hyperplanes (fixed seed). */
  def planes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
