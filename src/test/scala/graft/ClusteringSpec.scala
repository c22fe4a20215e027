package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

/** k-means-lite: assignment totality, argmin correctness, Lloyd descent. */
class ClusteringSpec extends SparkSpec {

  private lazy val vecs = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("every vector is assigned exactly one cluster in [0, k)") {
    val out = Clustering.kmeansLite(vecs, "vec_id", "e", 8, 2)
    assert(out.count() == vecs.count())
    assert(out.select("vec_id").distinct().count() == vecs.count())
    assert(out.filter(col("cluster") < 0 || col("cluster") >= 8).isEmpty)
  }

  test("assign picks the true argmin centroid (cross-checked on the driver)") {
    val cents = Clustering.centroids(
      vecs.withColumn("cluster", col("vec_id") % 4), "e", "cluster")
    val out = Clustering.assign(vecs, "vec_id", "e", cents)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val cm = cents.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.collect().foreach { r =>
      val (id, e) = (r.getLong(0), r.getSeq[Double](1))
      val best = cm.map { case (cid, c) =>
        (cid, e.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) })
      }.minBy { case (cid, d) => (d, cid) }
      assert(out(id)._1 == best._1, s"vec $id assigned ${out(id)._1}, argmin ${best._1}")
      assert(math.abs(out(id)._2 - best._2) < 1e-12)
    }
  }

  test("assignFused (NearestCells kernel) ≡ assign (broadcast argmin), bit-exact") {
    // drop cluster 2's centroid to exercise the empty-cluster index→cid
    // remap (kernel index 2 must come back as cid 3, not 2)
    val cents = Clustering.centroids(
      vecs.withColumn("cluster", col("vec_id") % 5), "e", "cluster")
      .filter(col("cid") =!= 2)
    val a = Clustering.assign(vecs, "vec_id", "e", cents)
    val b = Clustering.assignFused(vecs, "vec_id", "e", cents)
    // nullability may differ (min-struct vs element_at-of-literal); the
    // names and types must not
    assert(a.schema.map(f => (f.name, f.dataType)) == b.schema.map(f => (f.name, f.dataType)),
      s"${a.schema} vs ${b.schema}")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fused kernel assignment diverges from broadcast argmin")
  }

  test("DecimalVectorMean kernel ≡ composed per-dim decimal means, bit-exact") {
    import org.apache.spark.sql.types.DecimalType
    val assigned = vecs.withColumn("cluster", col("vec_id") % 7)
    val dim = vecs.select(size(col("e"))).head().getInt(0)
    assert(spark.catalog.functionExists("decimal_vector_mean"))
    val kernel = assigned.groupBy(col("cluster").as("cid"))
      .agg(call_function("decimal_vector_mean", col("e")).as("c"))
    val sums = (0 until dim).map(i =>
      sum(element_at(col("e"), i + 1).cast(DecimalType(28, 10))).as(s"s$i"))
    val composed = assigned.groupBy(col("cluster").as("cid"))
      .agg(sums.head, (sums.tail :+ count(lit(1)).as("n")): _*)
      .select(col("cid"),
        array((0 until dim).map(i => col(s"s$i").cast("double") / col("n")): _*).as("c"))
    // element-by-element bit equality (array compare is exact on doubles)
    val diff = kernel.alias("k").join(composed.alias("m"), Seq("cid"))
      .filter(col("k.c") =!= col("m.c")).count()
    assert(diff == 0, s"$diff clusters differ between kernel and composed means")
  }

  test("sharded assignFused (multi-chunk least-of-structs) ≡ single-kernel, bit-exact") {
    // k=10 centroids forced into 4 chunks of ≤3: the global winner must
    // come out of the cross-chunk (dist, cid) struct combine exactly as
    // the one-kernel argmin — including the dropped-centroid cid remap
    val cents = Clustering.centroids(
      vecs.withColumn("cluster", col("vec_id") % 11), "e", "cluster")
      .filter(col("cid") =!= 4)
    val single = Clustering.assignFused(vecs, "vec_id", "e", cents)
    val sharded = Clustering.assignFused(vecs, "vec_id", "e", cents, maxKernelK = 3)
    assert(single.schema.map(f => (f.name, f.dataType)) ==
      sharded.schema.map(f => (f.name, f.dataType)))
    assert(single.exceptAll(sharded).isEmpty && sharded.exceptAll(single).isEmpty,
      "sharded kernel assignment diverges from the single-kernel path")
  }

  test("assignFused at k=16384: sharded chunks keep the plan flat, assignment total and exact") {
    import spark.implicits._
    // synthetic 16384×8 centroid frame (deterministic coordinates) and a
    // small vector frame of the same dimension — the point is the KERNEL
    // shape at SemDeDup-scale k, not the data
    val k = 16384
    val dim = 8
    val cents = spark.range(k.toLong).select(
      col("id").as("cid"),
      array((0 until dim).map(i =>
        (pmod(col("id") * 31 + i, lit(997)).cast("double") / 997.0)): _*).as("c"))
    val pts = spark.range(64).select(
      col("id").as("vec_id"),
      array((0 until dim).map(i =>
        (pmod(col("id") * 13 + i * 7, lit(997)).cast("double") / 997.0)): _*).as("e"))
    val sharded = Clustering.assignFused(pts, "vec_id", "e", cents) // default 4096 → 4 chunks
    val single = Clustering.assignFused(pts, "vec_id", "e", cents, maxKernelK = k)
    assert(sharded.count() == 64)
    assert(sharded.exceptAll(single).isEmpty && single.exceptAll(sharded).isEmpty,
      "k=16384 sharded assignment diverges from the one-matrix kernel")
    // the sharded plan must reference NO flat matrix above the chunk
    // bound: 4 NearestCellDist chunks of ≤4096×8 doubles, not one
    // 16384×8 NearestCells literal
    val plan = sharded.queryExecution.executedPlan.toString
    assert(plan.contains("nearest_cell_dist"), s"sharded path not engaged:\n${plan.take(500)}")
  }

  test("centroidsFromState over day-split states ≡ centroids over the union, bit-exact") {
    // the mergeable-state contract the daily semantic stage rides on:
    // per-day decimal sums/counts, summed across any partition of the
    // rows, finish to EXACTLY the centroids a full rebuild computes
    val dim = vecs.select(size(col("e"))).head().getInt(0)
    val assigned = vecs.withColumn("cluster", col("vec_id") % 7)
    val full = Clustering.centroids(assigned, "e", "cluster", dim)
    // three disjoint "days" (uneven split), one state frame per day,
    // plus a day that misses some clusters entirely
    val states = (0 until 3).map { d =>
      Clustering.centroidState(
        assigned.filter(pmod(col("vec_id"), lit(3)) === d), "e", "cluster", dim)
    }.reduce(_ unionByName _)
    val derived = Clustering.centroidsFromState(states)
    val diff = full.alias("f").join(derived.alias("d"), Seq("cid"), "full")
      .filter(col("f.c").isNull || col("d.c").isNull || col("f.c") =!= col("d.c"))
      .count()
    assert(diff == 0, s"$diff clusters differ between state-derived and rebuilt centroids")
  }

  test("DecimalVectorSum kernel ≡ composed per-dim decimal sums (state form), bit-exact") {
    import org.apache.spark.sql.types.DecimalType
    val dim = vecs.select(size(col("e"))).head().getInt(0)
    val assigned = vecs.withColumn("cluster", col("vec_id") % 5)
    assert(spark.catalog.functionExists("decimal_vector_sum"))
    val kernel = Clustering.centroidState(assigned, "e", "cluster", dim)
    // composed fallback, forced: build it the way centroidState would
    // without the registered kernel
    val sums = (0 until dim).map(i =>
      sum(element_at(col("e"), i + 1).cast(DecimalType(28, 10))).as(s"__s$i"))
    val composed = assigned.groupBy(col("cluster").as("cid"))
      .agg(sums.head, (sums.tail :+ count(col("e")).as("n")): _*)
      .select(col("cid"),
        array((0 until dim).map(i =>
          col(s"__s$i").cast(DecimalType(38, 10))): _*).as("sums"),
        col("n"))
    val diff = kernel.alias("k").join(composed.alias("m"), Seq("cid"))
      .filter(col("k.sums") =!= col("m.sums") || col("k.n") =!= col("m.n")).count()
    assert(diff == 0, s"$diff clusters differ between kernel and composed state")
    // and both finish to the exact centroids
    val viaState = Clustering.centroidsFromState(kernel)
    val direct = Clustering.centroids(assigned, "e", "cluster", dim)
    val cdiff = viaState.alias("s").join(direct.alias("d"), Seq("cid"))
      .filter(col("s.c") =!= col("d.c")).count()
    assert(cdiff == 0, s"$cdiff centroid rows differ (state finish vs direct mean)")
  }

  test("semanticDedupIncremental with state-derived centroids ≡ the self-contained rebuild") {
    import graft.operators.Dedup
    val dim = vecs.select(size(col("e"))).head().getInt(0)
    val zone = Dedup.semanticDedup(vecs, "vec_id", "e", 16, 2, 0.95)
      .select(col("vec_id").as("id"), col("cluster"))
      .join(vecs.select(col("vec_id").as("id"), col("e").as("v")), "id")
      .localCheckpoint()
    val probes = vecs.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 10000).as("vec_id"),
      concat(array(element_at(col("e"), 1) + lit(0.01)), slice(col("e"), 2, 10000)).as("e"))
    // split the zone into two "days", state each, derive centroids
    val states = Seq(col("id") % 2 === 0, col("id") % 2 === 1).map(f =>
      Clustering.centroidState(zone.filter(f), "v", "cluster", dim))
      .reduce(_ unionByName _)
    val cents = Clustering.centroidsFromState(states)
    val viaState = Dedup.semanticDedupIncremental(
      zone, probes, "vec_id", "e", 0.95, centroidsOpt = Some(cents))
    val rebuilt = Dedup.semanticDedupIncremental(zone, probes, "vec_id", "e", 0.95)
    assert(viaState.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(viaState).isEmpty,
      "state-derived centroids changed the incremental semantic verdicts")
    spark.catalog.clearCache()
  }

  test("Lloyd rounds never increase the total within-cluster SSE") {
    def sse(iters: Int): Double =
      Clustering.kmeansLite(vecs, "vec_id", "e", 8, iters)
        .agg(sum("dist")).head().getDouble(0)
    val Seq(s1, s2, s3) = Seq(1, 2, 3).map(sse)
    assert(s2 <= s1 + 1e-9 && s3 <= s2 + 1e-9, s"SSE rose: $s1 → $s2 → $s3")
  }
}
