package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Candidate-volume census behind the scale table's d9/e3 decade growth:
  * counts the DISTINCT (increment, zone) id pairs that share at least one
  * LSH band key — the work the incremental dedup probes actually confirm —
  * split into same-base pairs (the scale generator's replicas of one
  * source row: id ≡ base mod 10⁶ on both sides) and cross-base pairs
  * (collisions a real corpus would also produce). Run against a
  * make_scale_corpus.py genDir and the matching ScaleProbe workDir (whose
  * standing zones it reads, never writes).
  *
  * Usage: runMain graft.ScaleDiag <genDir> <workDir>
  * Prints ONE JSON line: zone rows + candidate totals per family.
  */
object ScaleDiag {
  private val BaseStride = 1000000L // make_scale_corpus.py replica id stride

  def main(args: Array[String]): Unit = {
    val Array(genDir, workDir) = args.take(2)
    val spark = Sessions
      .builder("graft-scalediag", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "e3ab") { e3GeometryAB(spark, genDir, workDir); return }
    if (args.length > 2 && args(2) == "ccinc") { ccIncrementalAB(spark, workDir); return }

    def census(cand: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val c = cand.distinct().cache()
      val total = c.count()
      val same = c.filter(
        pmod(col("id_x"), lit(BaseStride)) === pmod(col("id_y"), lit(BaseStride))).count()
      c.unpersist()
      (total, same)
    }

    // e3: increment embedding band keys vs the stored sign-bit zone —
    // keyed under the zone's RECORDED geometry (the probes' own
    // discipline; the writer default is the size policy now, so the
    // census cannot assume any fixed shape)
    val embZone = spark.read.parquet(s"$workDir/emb_sig")
    val g = Dedup.readZoneGeometry(spark, s"$workDir/emb_sig").getOrElse(Map.empty)
    val incEmb = spark.read.parquet(s"$genDir/inc_embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    val incEmbBands = Dedup.embeddingSignatureRows(incEmb, "id", "v",
        bands = g.getOrElse("bands", 8L).toInt,
        bitsPerBand = g.getOrElse("bits_per_band", 8L).toInt,
        seed = g.getOrElse("seed", 42L))
      .select(col("id").as("id_x"), posexplode(col("bkeys")).as(Seq("band", "key")))
    val zoneEmbBands = embZone
      .select(col("id").as("id_y"), posexplode(col("bkeys")).as(Seq("band", "key")))
    val (e3Total, e3Same) =
      census(incEmbBands.join(zoneEmbBands, Seq("band", "key")).select("id_x", "id_y"))

    // d9: increment MinHash band keys vs the stored signature zone
    // (same n/numHashes/bands as the ScaleProbe d9 leg)
    val sigZone = Dedup.readSignatureIndex(spark, s"$workDir/sig_index")
    val incDocs = spark.read.parquet(s"$genDir/inc_documents.parquet")
    val incSigs = Dedup.signatureIndex(incDocs, "doc_id", "text", 3, 32)
    val incDocBands = Dedup.bandedFromSigs(incSigs, 32, 16)
      .select(col("id").as("id_x"), col("band"), col("key"))
    val zoneDocBands = Dedup.bandedFromSigs(sigZone, 32, 16)
      .select(col("id").as("id_y"), col("band"), col("key"))
    val (d9Total, d9Same) =
      census(incDocBands.join(zoneDocBands, Seq("band", "key")).select("id_x", "id_y"))

    println(
      s"""{"probe":"scalediag","zone_docs":${sigZone.count()},"zone_embeddings":${embZone.count()},""" +
        s""""d9_candidates":$d9Total,"d9_same_base":$d9Same,""" +
        s""""e3_candidates":$e3Total,"e3_same_base":$e3Same}""")
    spark.stop()
  }

  /** e3 band-geometry A/B at a given corpus scale: builds the embedding
    * signature zone twice — the gate default (8 bands × 8 bits: recall
    * 1−(1−p⁸)⁸ ≈ 0.9999 at θ=0.99, but a 1/256 per-band collision rate
    * on RANDOM pairs → candidates ≈ 3% of inc×corpus) and the
    * corpus-scale geometry (16 bands × 16 bits: the same ~0.9999 recall
    * at θ=0.99 with a 1/65536 per-band random rate — ~100× fewer
    * candidates for 4× the hyperplane math) — and times the incremental
    * probe min-of-3 against each, with its candidate census. The knob
    * already exists on every signature API; this measures what it buys
    * at the 100× decade. Zone builds are untimed setup.
    */
  private def e3GeometryAB(
      spark: org.apache.spark.sql.SparkSession, genDir: String, workDir: String): Unit = {
    val corpus = spark.read.parquet(s"$genDir/corpus_embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val inc = spark.read.parquet(s"$genDir/inc_embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val nZone = corpus.count()
    val parts = Seq((8, 8), (16, 16)).map { case (bands, bits) =>
      val zonePath = s"$workDir/diag_emb_sig_${bands}x$bits"
      graft.sources.Zones.delete(spark, zonePath)
      Dedup.writeEmbeddingSignatureIndex(spark, zonePath, corpus, "vec_id", "e",
        bands = bands, bitsPerBand = bits, mode = "overwrite")
      val zone = Dedup.readEmbeddingSignatureIndex(spark, zonePath)
      val counts = Dedup.readBucketCounts(spark, zonePath)
      val sec = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Dedup.embeddingNearDupIncremental(zone, inc, "vec_id", "e", 0.99,
          bands = bands, bitsPerBand = bits, indexCounts = counts).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      val candidates = inc
        .select(col("vec_id").as("id"), col("e").as("v"))
        .transform(d => Dedup.embeddingSignatureRows(d, "id", "v", bands, bits))
        .select(col("id").as("id_x"), posexplode(col("bkeys")).as(Seq("band", "key")))
        .join(zone.select(col("id").as("id_y"),
          posexplode(col("bkeys")).as(Seq("band", "key"))), Seq("band", "key"))
        .select("id_x", "id_y").distinct().count()
      s""""${bands}x$bits":{"sec":${BigDecimal(sec).setScale(2, BigDecimal.RoundingMode.HALF_UP)},"candidates":$candidates}"""
    }
    println(s"""{"probe":"e3ab","zone_embeddings":$nZone,${parts.mkString(",")}}""")
    spark.stop()
  }

  /** Star-relabel vs affected-component A/B behind
    * [[graft.operators.Curation.CcIncPruneMinAssignmentRows]]: a
    * synthetic parquet assignment zone (clusters of 4) at 1M/4M/16M
    * rows takes a fixed 2k-pair day (1k cluster bridges + 1k brand-new
    * nodes) through both [[graft.operators.Curation.dupClustersIncremental]]
    * routes, min-of-3 each, with an exact order-independent checksum
    * equality check (count + decimal sum of row hashes). This measures
    * the crossover the engagement threshold claims: below ~1M rows the
    * pruned path's fixed job overhead loses; above it, the star
    * relabel's full-zone component search does.
    */
  private def ccIncrementalAB(
      spark: org.apache.spark.sql.SparkSession, workDir: String): Unit = {
    import spark.implicits._
    import graft.operators.Curation
    def minOf3(body: => Unit): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        sum(xxhash64(col("id"), col("cluster_id"), col("cluster_size"),
          col("is_canonical")).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val parts = Seq(1000000L, 4000000L, 16000000L).map { n =>
      val zonePath = s"$workDir/diag_cc_assignment_$n"
      graft.sources.Zones.delete(spark, zonePath)
      spark.range(n).select(
        col("id"),
        ((col("id") / 4).cast("long") * 4).as("cluster_id"),
        lit(4L).as("cluster_size"),
        (col("id") % 4 === 0).as("is_canonical"))
        .write.mode("overwrite").parquet(zonePath)
      val zone = spark.read.parquet(zonePath)
      val stride = n / 1000 / 4 * 4
      val pairs = ((0L until 1000L).map(i => (i * stride, i * stride + 4)) ++
        (0L until 1000L).map(i => (n + 2 * i, n + 2 * i + 1)))
        .toDF("id_a", "id_b")
      val star = minOf3 {
        Curation.dupClustersIncremental(zone, pairs, "id_a", "id_b").count()
      }
      val pruned = minOf3 {
        Curation.dupClustersIncremental(zone, pairs, "id_a", "id_b",
          assignmentRows = Some(n), maxNewNodes = Curation.CcIncMaxNewNodes,
          minAssignmentRows = 0L).count()
      }
      val ok = checksum(Curation.dupClustersIncremental(zone, pairs, "id_a", "id_b")) ==
        checksum(Curation.dupClustersIncremental(zone, pairs, "id_a", "id_b",
          assignmentRows = Some(n), maxNewNodes = Curation.CcIncMaxNewNodes,
          minAssignmentRows = 0L))
      graft.sources.Zones.delete(spark, zonePath)
      s""""x$n":{"star_sec":${BigDecimal(star).setScale(2, BigDecimal.RoundingMode.HALF_UP)},""" +
        s""""pruned_sec":${BigDecimal(pruned).setScale(2, BigDecimal.RoundingMode.HALF_UP)},"match":$ok}"""
    }
    println(s"""{"probe":"ccinc",${parts.mkString(",")}}""")
    spark.stop()
  }
}
