package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

class CurationSpec extends SparkSpec {

  test("connectedComponents labels every vertex with its component's min id") {
    import spark.implicits._
    // two chains and an isolated pair: {1-2-3-4}, {10-11}, {20-21-22}
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L), (21L, 22L))
      .toDF("id_a", "id_b")
    val cc = Curation.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("union-find kernel ≡ iterative propagation, and non-numeric ids route iterative") {
    import spark.implicits._
    // adversarial mix for the kernel: a chain whose edges arrive in
    // descending order (the union-by-min worst case for tree depth),
    // stars, a merge edge bridging two components, self edges
    // (dupClustersIncremental emits them for canonicals), duplicate and
    // reversed duplicates of the same edge
    val edges =
      (0L until 200L).reverse.map(i => (i + 1L, i)) ++ // descending chain 0..200
        (0L until 5L).flatMap(h => (1L to 8L).map(l => (1000L + h, 2000L + h * 10 + l))) ++
        Seq((200L, 1000L), (3000L, 3000L), (10L, 11L), (11L, 10L), (10L, 11L))
    val pairs = edges.toDF("id_a", "id_b")
    val viaKernel = Curation.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaIterative = Curation.connectedComponentsCounted(pairs, "id_a", "id_b")._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaKernel.sameElements(viaIterative),
      "kernel and iterative routes disagree")
    // the bridged chain+star component is labeled by the global min 0
    val m = viaKernel.toMap
    assert(m(1000L) == 0L && m(200L) == 0L && m(2000L + 0L * 10 + 3L) == 0L)
    assert(m(3000L) == 3000L, "self-edge singleton keeps its own label")
    // string ids are outside the kernel's order — the iterative route
    // must carry them and agree with the long-id answer
    val strPairs = pairs.select(
      format_string("doc_%04d", col("id_a")).as("id_a"),
      format_string("doc_%04d", col("id_b")).as("id_b"))
    val viaStr = Curation.connectedComponents(strPairs, "id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    val expected = viaKernel.map { case (id, l) => (f"doc_$id%04d", f"doc_$l%04d") }.sorted
    assert(viaStr.sameElements(expected), "string-id route disagrees with long-id labels")
    // MIXED integral widths (Int aCol, Long bCol with values past Int
    // range): labels must come out in the WIDER type, never overflow-cast
    // into the narrower one (the round-12 ADVICE trap)
    val mixed = Seq((1, 5000000000L), (2, 5000000001L), (1, 2L))
      .toDF("id_a", "id_b")
    val viaMixed = Curation.connectedComponents(mixed, "id_a", "id_b")
    assert(viaMixed.schema("id").dataType ==
      org.apache.spark.sql.types.LongType, "mixed-width labels must widen")
    val mm = viaMixed.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(mm == Map(1L -> 1L, 2L -> 1L, 5000000000L -> 1L, 5000000001L -> 1L),
      s"mixed-width component labels wrong: $mm")
    // FLOAT/DOUBLE ids: the sum witness is excluded by type (FP rounding
    // can absorb a label decrease inside a large sum); the exact
    // changed-row witness must still converge to the right labels —
    // before round 12 this shape threw, and round 12's fix made it
    // silently witness through a lossy double sum
    val dblPairs = pairs.select(
      (col("id_a").cast("double") + lit(0.5)).as("id_a"),
      (col("id_b").cast("double") + lit(0.5)).as("id_b"))
    val viaDbl = Curation.connectedComponents(dblPairs, "id_a", "id_b")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val expDbl = viaKernel.map { case (id, l) => (id + 0.5, l + 0.5) }.sorted
    assert(viaDbl.sameElements(expDbl), "double-id route disagrees with long-id labels")
  }

  test("connectedComponents: 50k chain + stars converge in O(log n) rounds, flat plan") {
    import spark.implicits._
    val n = 50000L
    // worst-case diameter (one chain of 50k nodes) mixed with wide stars
    // (hub h=even-10k ← 20 leaves each): label propagation alone would
    // need O(diameter) = 50k rounds on the chain — the pointer-jumping
    // (path-halving) step must collapse it geometrically
    val chain = (0L until n - 1).map(i => (i, i + 1))
    val stars = (0L until 10L).flatMap(h =>
      (1L to 20L).map(leaf => (1000000L + h, 2000000L + h * 100 + leaf)))
    val pairs = (chain ++ stars).toDF("id_a", "id_b")
    val (labels, rounds) =
      Curation.connectedComponentsCounted(pairs, "id_a", "id_b")
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    assert(rounds <= bound, s"$rounds rounds for a $n-chain — bound $bound (O(log n)) violated")
    // correctness at this scale: the whole chain is ONE component labeled
    // by its min id, each star keeps its hub's label
    val byLabel = labels.groupBy("label").agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byLabel(0L) == n, s"chain component size ${byLabel.get(0L)}")
    (0L until 10L).foreach(h => assert(byLabel(1000000L + h) == 21L))
    // plan depth stays O(1) across rounds: every round re-roots on a
    // checkpoint leaf, so the FINAL frame's physical plan must be scan-
    // shaped, not a 30-round join tower
    val planLen = labels.queryExecution.executedPlan.toString.length
    assert(planLen < 2000, s"final plan $planLen chars — lineage accumulated across rounds")
  }

  test("dupClusters marks exactly one canonical doc per cluster") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = Curation.dupClusters(pairs, "id_a", "id_b").collect()
    assert(out.count(_.getBoolean(3)) == 2) // one per cluster
    assert(out.filter(_.getLong(1) == 1L).map(_.getLong(2)).forall(_ == 3L))
    assert(out.filter(_.getLong(1) == 7L).map(_.getLong(2)).forall(_ == 2L))
  }

  test("dupClustersIncremental folds new pairs into an assignment, merges included") {
    import spark.implicits._
    // old pairs: clusters {1,2,3}, {10,11}, {20,21} — and {50,51,52},
    // which no new pair touches: it must ride the affected-component
    // path's untouched pass-through unchanged
    val oldPairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (50L, 51L), (51L, 52L)).toDF("id_a", "id_b")
    val assignment = Curation.dupClusters(oldPairs, "id_a", "id_b")
    // new pairs: 3-10 BRIDGES two old clusters; 30-31 is a brand-new
    // cluster; 21-22 extends an old one
    val newPairs = Seq((3L, 10L), (30L, 31L), (21L, 22L)).toDF("id_a", "id_b")
    val got = Curation.dupClustersIncremental(assignment, newPairs, "id_a", "id_b")
    val full = Curation.dupClusters(oldPairs.unionByName(newPairs), "id_a", "id_b")
    assertSameRows(got, full, "incremental clusters vs full recompute")
    // the bridge really merged: 11's label is now 1
    assert(got.filter(col("id") === 11L && col("cluster_id") === 1L).count() == 1)
    // the untouched cluster survived with size and canonical intact
    assert(got.filter(col("id") === 52L && col("cluster_id") === 50L &&
      col("cluster_size") === 3L && !col("is_canonical")).count() == 1)
    // the default call above rode the star relabel (no assignmentRows →
    // pruning disengaged); force BOTH pruning arms and compare row for
    // row: the affected-component path (engagement thresholds zeroed)
    // and the oversized-new-node star fallback inside an engaged call
    val viaPruned = Curation.dupClustersIncremental(
      assignment, newPairs, "id_a", "id_b",
      assignmentRows = Some(assignment.count()),
      maxNewNodes = Curation.CcIncMaxNewNodes, minAssignmentRows = 0L)
    assertSameRows(got, viaPruned, "star relabel vs affected-component path")
    val viaEngagedFallback = Curation.dupClustersIncremental(
      assignment, newPairs, "id_a", "id_b",
      assignmentRows = Some(assignment.count()),
      maxNewNodes = 0L, minAssignmentRows = 0L)
    assertSameRows(got, viaEngagedFallback, "pruned path vs oversized-new-node fallback")
    // and composition holds: a second day over the first day's output
    val day3 = Seq((31L, 32L)).toDF("id_a", "id_b")
    val got2 = Curation.dupClustersIncremental(got, day3, "id_a", "id_b")
    val full2 = Curation.dupClusters(
      oldPairs.unionByName(newPairs).unionByName(day3), "id_a", "id_b")
    assertSameRows(got2, full2, "day-over-day composition")
  }

  test("hashSplit is deterministic and roughly proportional") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val s1 = Curation.hashSplit(ids, "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts("train") > 1500 && counts("train") < 1700, s"got $counts")
    assert(counts("val") > 120 && counts("val") < 280, s"got $counts")
    // determinism: a re-run assigns identical membership
    val s2 = Curation.hashSplit(ids, "id", Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("stratifiedSample applies per-stratum rates over stable membership") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else "fr")).toDF("id", "lang")
    val out = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 10, "fr" -> 90), 50)
    val rates = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rates("en") < 200, s"en kept ${rates("en")} of 1000 at 10%")
    assert(rates("fr") > 1600, s"fr kept ${rates("fr")} of 2000 at 90%")
    // sampled ids are a subset of the full-rate run (nested membership)
    val wider = Curation.stratifiedSample(df, "id", "lang", Map("en" -> 60, "fr" -> 95), 50)
    assert(out.join(wider, Seq("id"), "left_anti").isEmpty,
      "raising the rate must only ADD members, never swap them")
  }

  test("tfIdfLog ranks corpus-rare terms above ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta beta common common"),
      (2L, "gamma common common"),
      (3L, "delta common")).toDF("doc_id", "text")
    val w = Curation.tfIdfLog(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // 'common' appears in every doc → idf ln(1) = 0
    assert(math.abs(w((1L, "common"))) < 1e-12)
    assert(w((1L, "beta")) > w((1L, "common")))
    // tf 1 · ln(3/1); last-ulp tolerance — Spark's LOG is StrictMath-based
    // (this very divergence is why the gate uses the linear-idf variant)
    assert(math.abs(w((2L, "gamma")) - math.log(3.0)) < 1e-14)
  }

  test("containmentPairs finds an excerpt inside its source, not unrelated docs") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"),
      (2L, "completely different content about databases and distributed systems at scale")).toDF("doc_id", "text")
    val test = Seq(
      (100L, "brown fox jumps over the lazy dog"), // excerpt of doc 1
      (200L, "unrelated benchmark question text entirely")).toDF("doc_id", "text")
    val out = Curation.containmentPairs(train, "doc_id", test, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 100L)))
  }

  test("bm25 ranks rarer terms and higher tf above common/low-tf, saturating in tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha alpha beta common common"),
      (2L, "gamma common beta"),
      (3L, "delta common common common")).toDF("doc_id", "text")
    val s = Curation.bm25(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4)).toMap
    // same doc (same dl): tf 3 > tf 1; rare term ('beta', df 2) > 'common' (df 3)
    assert(s((1L, "alpha")) > s((1L, "beta")))
    assert(s((1L, "beta")) > s((1L, "common")))
    // idf is positive for every observed df (rational RSJ with N=3)
    assert(s.values.forall(_ > 0.0))
    // saturation: same idf and dl, tf=3 vs tf=1 → gain strictly under 3×
    // (k1 bounds term-frequency growth sublinearly)
    val idf = (3.0 - 1.0 + 0.5) / (1.0 + 0.5) // df=1
    val tfPart3 = s((1L, "alpha")) / idf
    val tfPart1 = (1.0 * 2.2) / (1.0 + 1.2 * (0.25 + 0.75 * (6.0 / (12.0 / 3.0))))
    assert(tfPart3 < 3.0 * tfPart1, s"no saturation: $tfPart3 vs 3×$tfPart1")
  }

  test("lineDedupCorpus keeps first occurrences only and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep one\nshared line\nkeep two"),
      (2L, "shared line\nunique here"),
      (3L, "shared line\nshared line\nlast doc")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.lineDedupCorpus(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((3, 3, "keep one\nshared line\nkeep two"))) // first occurrence keeps it
    assert(out(2L) == ((2, 1, "unique here")))
    assert(out(3L) == ((3, 1, "last doc")))
    // corpus-wide: kept lines == distinct lines
    assert(out.values.map(_._2).sum == 5)
  }
}
