package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.control.RunLedger
import graft.operators.SimilaritySearch
import graft.sources.Zones

/** Nightly embedding-index maintenance — the job that CONSUMES the IVF
  * drift policy ([[graft.operators.SimilaritySearch.IvfAppendStats]]):
  * each day's embedding increment folds into the persisted index by
  * assignment only (O(increment × k) — no sampling, no Lloyd rounds, no
  * touch of standing cell files), the increment's quantization drift
  * ratio is measured against the build-time baseline and RECORDED in the
  * run ledger, and when the ratio trips the retrain threshold the job
  * rebuilds the quantizer from the zone's own vectors in place — so the
  * index the daytime ANN queries probe never decays unbounded.
  *
  *   gate (already ran today? RUNNING row? → skip)
  *   → day 1: build (train + assign + baseline) into the day-partitioned
  *     zone layout
  *   → later days: assignment-only append (day-scoped dynamic partition
  *     overwrite — a retried day replaces its own leftovers)
  *   → drift ratio = increment mean squared quantization error /
  *     build-time baseline, logged in the ledger SUCCESS message
  *   → ratio > threshold: full retrain from the zone's own vectors into
  *     the NEXT index version ([[SimilaritySearch.retrainIvfIndexDaily]]
  *     into `v<N+1>` while `v<N>` keeps serving), then an atomic pointer
  *     flip — no state pairs new centroids with old assignments;
  *     baseline reset, "RETRAINED" recorded
  *   → ledger SUCCESS row carrying counts + drift
  *
  * Usage: runMain graft.pipeline.IndexRun <incrementDir> <warehouseDir> <runTs>
  *   incrementDir: parquet of the day's vectors (vec_id, embedding[, …])
  *   runTs:        injected "now" (yyyy-MM-dd HH:mm:ss) — F11 determinism
  */
object IndexRun {
  val ProcessName = "index_pipeline"
  val StaleRunningHours = 24
  val NCells = 16
  val RetrainInflation = 1.5

  /** The live index version — `<base>/CURRENT` names a `v<N>` subdir.
    * Retrain builds `v<N+1>` completely (the old version keeps serving),
    * then flips this pointer in one rename: there is no state in which
    * new centroids can pair with old assignments. A missing/corrupt
    * pointer recovers to the highest complete version on disk.
    */
  private def pointer(base: String) = new org.apache.hadoop.fs.Path(s"$base/CURRENT")

  private def fsFor(spark: SparkSession, base: String) =
    new org.apache.hadoop.fs.Path(base).getFileSystem(spark.sessionState.newHadoopConf())

  /** Resolve the live version's path, or None for a brand-new index.
    * Falls back to (and repairs from) the highest on-disk `v<N>` whose
    * assignments completed, so a crash after a version build but before
    * or during the pointer flip self-heals.
    */
  def currentIndexPath(spark: SparkSession, base: String): Option[String] = {
    val fs = fsFor(spark, base)
    val fromPointer =
      if (!fs.exists(pointer(base))) None
      else {
        val in = fs.open(pointer(base))
        val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        Some(s"$base/$v").filter(p =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$p/assignments/_SUCCESS")))
      }
    fromPointer.orElse {
      if (!fs.exists(new org.apache.hadoop.fs.Path(base))) None
      else fs.listStatus(new org.apache.hadoop.fs.Path(base)).toSeq
        .map(_.getPath.getName)
        .filter(_.matches("v\\d+"))
        .filter(v => fs.exists(
          new org.apache.hadoop.fs.Path(s"$base/$v/assignments/_SUCCESS")))
        .sortBy(_.drop(1).toInt)
        .lastOption
        .map(s"$base/" + _)
    }
  }

  private def writePointer(spark: SparkSession, base: String, version: String): Unit = {
    val fs = fsFor(spark, base)
    val tmp = new org.apache.hadoop.fs.Path(s"$base/CURRENT.__tmp__")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    // delete+rename: the gap is covered by currentIndexPath's
    // highest-version recovery, so a crash here is still consistent
    fs.delete(pointer(base), false)
    if (!fs.rename(tmp, pointer(base)))
      throw new java.io.IOException(s"pointer flip failed for $base")
  }

  private def versionOf(path: String): Int =
    path.split('/').last.drop(1).toInt

  /** Delete index versions other than the live one. Runs at the START
    * of each run, never at flip time: a retired version therefore
    * survives a full run-cycle as a GRACE copy — a daytime reader that
    * resolved CURRENT just before a retrain's flip can finish its scan
    * (deleting at flip time would yank files mid-query), and by the next
    * nightly run every such reader is long done. Also reclaims crashed
    * retrains' never-flipped builds; the single-writer ledger gate
    * guarantees nobody is mid-build here.
    */
  private def sweepRetired(spark: SparkSession, base: String, live: String): Unit = {
    val fs = fsFor(spark, base)
    if (fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.listStatus(new org.apache.hadoop.fs.Path(base)).toSeq
        .map(_.getPath)
        .filter(p => p.getName.matches("v\\d+") && p.getName.drop(1).toInt != versionOf(live))
        .foreach(fs.delete(_, true))
  }

  def main(args: Array[String]): Unit = {
    val Array(incrementDir, whDir, runTs) = args.take(3)
    val spark = Sessions
      .builder("graft-index", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outcome = run(spark, incrementDir, whDir, runTs)
    println(s"""{"pipeline":"$ProcessName","outcome":"$outcome"}""")
    spark.stop()
  }

  /** Returns "SKIPPED" (gate) or "SUCCESS"; rethrows after recording a
    * FAILED ledger row if any stage fails.
    */
  def run(
      spark: SparkSession,
      incrementDir: String,
      whDir: String,
      runTs: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nCells: Int = NCells,
      retrainInflation: Double = RetrainInflation): String = {
    val runDate = runTs.substring(0, 10)
    val ledgerPath = s"$whDir/control/index_log"
    val ledger0 =
      if (Zones.exists(spark, ledgerPath)) Zones.read(spark, ledgerPath)
      else RunLedger.empty(spark)
    if (RunLedger.ranToday(ledger0, ProcessName, runDate) ||
        RunLedger.anyRunning(ledger0, ProcessName, runTs, StaleRunningHours)) return "SKIPPED"
    val (ledger1, runId) = RunLedger.startRun(ledger0, ProcessName, runTs)
    Zones.overwriteSwap(ledger1, ledgerPath)
    try {
      val indexBase = s"$whDir/index/ivf"
      val increment = spark.read.parquet(incrementDir)
      val message =
        currentIndexPath(spark, indexBase) match {
          case None =>
            SimilaritySearch.buildIvfIndexDaily(
              spark, s"$indexBase/v1", increment, idCol, vecCol, nCells, runDate)
            writePointer(spark, indexBase, "v1")
            val n = spark.read.parquet(s"$indexBase/v1/meta")
              .select("n_vectors").head().getLong(0)
            s"Index day $runDate: BUILT ivf($nCells) v1 from $n vector(s)."
          case Some(live) =>
            sweepRetired(spark, indexBase, live)
            val st = SimilaritySearch.appendIvfIndexDaily(
              spark, live, increment, idCol, vecCol, runDate, retrainInflation)
            val ratio =
              if (st.baselineMeanDist2 > 0) st.incrementMeanDist2 / st.baselineMeanDist2
              else 1.0
            val base = f"Index day $runDate: appended ${st.nAppended} vector(s), " +
              f"quantization drift $ratio%.3f " +
              f"(increment ${st.incrementMeanDist2}%.4f vs baseline ${st.baselineMeanDist2}%.4f, " +
              f"retrain at ${retrainInflation}%.1fx)."
            if (st.needsRetrain) {
              val nextV = s"v${versionOf(live) + 1}"
              SimilaritySearch.retrainIvfIndexDaily(
                spark, live, s"$indexBase/$nextV", nCells)
              writePointer(spark, indexBase, nextV)
              // the retired version is NOT deleted here: it stays one
              // cycle for in-flight readers and is swept next run
              base + s" RETRAINED: $nextV rebuilt from the full zone, " +
                "baseline reset, pointer flipped."
            } else base
        }
      val done = RunLedger.finishRun(
        Zones.read(spark, ledgerPath), runId, "SUCCESS", runTs,
        messageOverride = Some(message))
      Zones.overwriteSwap(done, ledgerPath)
      "SUCCESS"
    } catch {
      case scala.util.control.NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
        val failed = RunLedger.finishRun(
          Zones.read(spark, ledgerPath), runId, "FAILED", runTs,
          messageOverride = Some(s"FAILED: $msg"))
        Zones.overwriteSwap(failed, ledgerPath)
        throw e
    }
  }
}
