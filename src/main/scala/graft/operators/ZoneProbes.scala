package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Probe-side pruning for daily joins against STANDING zones — the
  * machinery that keeps an O(increment) day from paying an O(corpus)
  * exchange.
  *
  * The shape: every incremental operator joins a bounded daily increment
  * against a corpus-scale zone (fingerprint anti-join, banded signature
  * probe, cluster-keyed semantic probe). A plain shuffle join exchanges
  * BOTH sides on the key — a daily shuffle of the whole standing index,
  * the one cost in these paths that grows with the corpus instead of the
  * increment (the round-10 d9 10×-corpus ratio of 1.19× was exactly this
  * term). The fix here: the increment's key set rides to the zone scan as
  * a BROADCAST left-semi before any exchange, so the only zone rows that
  * ever enter a shuffle are those in buckets the increment actually
  * touches — O(candidates). The zone still pays one linear SCAN (columnar,
  * pruned to the key columns); no layout can avoid that for hash-image
  * keys (md5/xxhash keys have no file-level locality to prune on), and a
  * bucketed layout would only relocate the exchange, not remove it, while
  * breaking the zones' month-fold lifecycle (bucket files cannot be
  * written through the path-based day-partition publish).
  *
  * Exactness: pruning keeps WHOLE key groups — a zone row whose key is
  * absent from the increment can never join — so every downstream
  * operator (bucket counts, grid-salting factors, candidate joins) sees
  * bit-identical inputs for every key that can still match.
  *
  * Dispatch: the broadcast is bounded by the INCREMENT's distinct-key
  * count. Past [[BroadcastProbeMaxRows]] the prune disengages and the
  * plain shuffle join stands — at that increment size the exchange is
  * proportionally sane, and Spark's own runtime bloom-filter rewrite
  * covers the gap at cluster scale.
  */
object ZoneProbes {

  /** Engagement bound for the broadcast prune: ~1M probe keys ≈ tens of
    * MB broadcast — comfortably inside executor/driver budgets at any
    * cluster size; a larger increment takes the plain join.
    */
  val BroadcastProbeMaxRows: Long = 1L << 20

  /** Zone rows whose `keys` tuple appears in `probe` — a broadcast
    * left-semi that runs on the zone SCAN, before any exchange. Callers
    * dispatch via `engage` (their increment-size knowledge); disengaged
    * the zone passes through untouched.
    */
  def pruneByKeys(
      zone: DataFrame, probe: DataFrame, keys: Seq[String], engage: Boolean): DataFrame =
    if (!engage) zone
    else zone.join(broadcast(probe.select(keys.map(col): _*).distinct()), keys, "left_semi")

  /** `increment LEFT ANTI zone` on `keys`, with the corpus-scale side
    * kept out of every exchange: the probe direction is INVERTED — the
    * zone scans once against the broadcast increment keys (left-semi,
    * producing the ≤increment-sized hit set), and the increment
    * anti-joins the hits. Result-identical to the plain anti join;
    * `nIncrement` (the caller's row count for the increment, usually
    * already in hand for its ledger) gates the broadcast. Increment keys
    * are assumed non-null (fingerprints) — null-keyed rows never match
    * an anti join's probe on either path.
    */
  def zoneAntiJoin(
      increment: DataFrame,
      zone: DataFrame,
      keys: Seq[String],
      nIncrement: Long): DataFrame =
    if (nIncrement > BroadcastProbeMaxRows) increment.join(zone, keys, "left_anti")
    else {
      val hits = zone.join(
        broadcast(increment.select(keys.map(col): _*).distinct()), keys, "left_semi")
      increment.join(broadcast(hits), keys, "left_anti")
    }
}
