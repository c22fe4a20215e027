package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic k-means-lite over an embedding column — corpus
  * clustering for mixture balancing / topic bucketing of training data
  * (beyond-reference; the batch companion to [[SimilaritySearch]]'s IVF
  * quantizer).
  *
  * Everything is expressed so two engines reproduce it bit-for-bit:
  * init is `id % k` (no RNG), per-dimension centroid means accumulate in
  * decimal (order-independent) with one final double division, distances
  * fold dimensions left-to-right in a fixed order, and argmin ties break
  * on cluster id. That makes full k-means oracle-checkable — the same
  * property the dedup family's gates rely on.
  *
  * Scale shape: each Lloyd iteration is one posexplode + hash
  * aggregation on (cluster, dim) — linear, partially aggregated
  * map-side — plus one assignment pass joining the k-row centroid frame
  * in as a broadcast. min-struct argmin (not a window) keeps the
  * per-vector reduction partial-agg'd too. For k beyond a few thousand
  * the broadcast k-row amplification stops being the right plan — that
  * regime belongs to the fused codegen kernel path
  * (`functions/NearestCells`) the IVF probe uses.
  */
object Clustering {

  private def dmean(c: Column): Column =
    sum(c.cast(DecimalType(28, 10))).cast("double") / count(lit(1))

  /** Per-cluster, per-dimension decimal-exact means, rebuilt into
    * centroid arrays: (cid, c).
    */
  def centroids(assigned: DataFrame, vecCol: String, clusterCol: String): DataFrame =
    assigned
      .select(col(clusterCol).as("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("cid", "pos")
      .agg(dmean(col("v")).as("cv"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col("cid"), transform(col("pc"), p => p.getField("cv")).as("c"))

  /** Nearest-centroid assignment: squared-L2 against every centroid
    * (broadcast k rows), argmin via a partially-aggregated min-struct
    * with cid tie-break.
    */
  def assign(vecs: DataFrame, idCol: String, vecCol: String, cents: DataFrame): DataFrame = {
    val dist = aggregate(
      zip_with(col(vecCol), col("c"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z)
    vecs
      .crossJoin(broadcast(cents))
      .withColumn("dist", dist)
      .groupBy(col(idCol))
      .agg(min(struct(col("dist"), col("cid"))).as("m"))
      .select(col(idCol), col("m.cid").as("cluster"), col("m.dist").as("dist"))
  }

  /** Fixed-iteration Lloyd's: init `id % k`, then `iters` rounds of
    * centroid recompute + reassign. Returns (id, cluster, dist) for the
    * final assignment. The vector frame is traversed once per round —
    * cache it (done here) so each round's two passes (centroid agg +
    * assignment join-back) don't re-read the source.
    */
  def kmeansLite(
      vecs: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val base = vecs.select(col(idCol), col(vecCol)).cache()
    var assigned = base.withColumn("cluster", col(idCol) % k)
    var result: DataFrame = assigned.withColumn("dist", lit(0.0)).select(idCol, "cluster", "dist")
    for (_ <- 1 to iters) {
      val cents = centroids(assigned, vecCol, "cluster")
      result = assign(base, idCol, vecCol, cents)
      assigned = base.join(result.select(col(idCol), col("cluster")), idCol)
    }
    result
  }
}
