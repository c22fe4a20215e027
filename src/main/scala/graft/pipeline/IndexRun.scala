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
  *   → ratio > threshold: full in-place retrain from the zone
  *     ([[SimilaritySearch.rebuildIvfIndexDaily]]), baseline reset,
  *     "RETRAINED" recorded
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
      val indexPath = s"$whDir/index/ivf"
      val increment = spark.read.parquet(incrementDir)
      val message =
        if (!Zones.exists(spark, s"$indexPath/assignments/_SUCCESS")) {
          SimilaritySearch.buildIvfIndexDaily(
            spark, indexPath, increment, idCol, vecCol, nCells, runDate)
          val n = spark.read.parquet(s"$indexPath/meta")
            .select("n_vectors").head().getLong(0)
          s"Index day $runDate: BUILT ivf($nCells) from $n vector(s)."
        } else {
          val st = SimilaritySearch.appendIvfIndexDaily(
            spark, indexPath, increment, idCol, vecCol, runDate, retrainInflation)
          val ratio =
            if (st.baselineMeanDist2 > 0) st.incrementMeanDist2 / st.baselineMeanDist2
            else 1.0
          val base = f"Index day $runDate: appended ${st.nAppended} vector(s), " +
            f"quantization drift $ratio%.3f " +
            f"(increment ${st.incrementMeanDist2}%.4f vs baseline ${st.baselineMeanDist2}%.4f, " +
            f"retrain at ${retrainInflation}%.1fx)."
          if (st.needsRetrain) {
            SimilaritySearch.rebuildIvfIndexDaily(spark, indexPath, nCells)
            base + " RETRAINED: centroids rebuilt from the full zone, baseline reset."
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
