package graft.operators

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float> / array<double>). Beyond-reference scope.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    Cross join, O(queries × corpus); fine when the query set is small
  *    or as the per-bucket kernel below.
  *  - [[lshTopK]]: random-hyperplane LSH — the 100 TB path. Vectors are
  *    bucketed by sign-bit signature (one narrow map stage); queries probe
  *    only their bucket (plus multi-probe neighbors), turning the cross
  *    join into a bucket-local join. Recall is tunable via bits/probes and
  *    property-tested against the brute-force baseline.
  *
  * All vector math is plain Catalyst higher-order functions (`zip_with` +
  * `aggregate`) in double precision — codegen-friendly, no UDFs.
  */
object SimilaritySearch {

  /** Sequential-order dot product in double (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity, evaluated as (dot / norm_a) / norm_b — fixed
    * operation order so results are bit-stable across runs.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / norm(a) / norm(b)

  /** Exact cosine top-k: for each query vector, the k most similar corpus
    * vectors (excluding itself), ranked desc with id tie-break.
    * Output: (query_id, rank, neighbor_id).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Deterministic random hyperplanes (fixed seed → identical across runs
    * and executors; shipped as literals, so no closure serialization).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector under the given hyperplanes. */
  def signature(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex
      .map { case (p, i) =>
        val plane = array(p.map(lit): _*)
        when(dot(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** ANN top-k via random-hyperplane bucketing: join query and corpus on
    * the LSH signature (optionally multi-probe: each query also probes all
    * signatures at Hamming distance 1), brute-force within the bucket.
    * Output schema matches [[bruteForceTopK]]; recall < 1 by construction.
    *
    * bits ≤ 0 → auto-size to the corpus: ~log2(n / 4k) sign bits, so the
    * expected bucket holds ~4k candidates — enough to fill top-k with
    * near-random embeddings while still cutting the probe set by
    * 2^bits/(bits+1) with multi-probe. Pass bits explicitly for clustered
    * real-world embeddings (they tolerate many more bits).
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      bits: Int = 0,
      multiProbe: Boolean = true,
      seed: Long = 42L): DataFrame = {
    val head = corpus.select(size(col(vecCol)), count(lit(1)).over()).head()
    val dim = head.getInt(0)
    val nBits =
      if (bits > 0) bits
      else math.max(1, (math.log(head.getLong(1).toDouble / (4.0 * k)) / math.log(2)).floor.toInt)
    val planes = hyperplanes(dim, nBits, seed)
    val c = corpus.select(
      col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"),
      signature(col(vecCol).cast("array<double>"), planes).as("sig"))
    val qBase = queries.select(
      col(idCol).cast("long").as("query_id"),
      col(vecCol).cast("array<double>").as("qv"),
      signature(col(vecCol).cast("array<double>"), planes).as("qsig"))
    val probes =
      if (!multiProbe) qBase.withColumn("sig", col("qsig"))
      else qBase.withColumn(
        "sig",
        explode(array((col("qsig") +: (0 until nBits).map(b => col("qsig").bitwiseXOR(lit(1L << b)))): _*)))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    probes
      .join(c, "sig")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
