package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed warehouse zones (staging / warehouse / datamart dirs)
  * with the write disciplines the reference implements as SQL statements:
  *
  *  - S5 truncate-and-load  → `overwriteAll`
  *  - S7 daily upsert       → [[upsertPartitioned]]: dynamic partition
  *    overwrite rewrites ONLY the partitions the increment touches — the
  *    at-scale replacement for `INSERT ... ON DUPLICATE KEY UPDATE`
  *    (load_aggregate.py:90-107). A 100 TB AGGREGATE table partitioned by
  *    day never rewrites history to absorb today's snapshot.
  *
  * Time-partitioned facts (AGGREGATE by DATE_SK, events by day) get
  * partition pruning for free: a `DATE_SK = n` predicate prunes to one
  * directory (verified in ZonesSpec via the physical plan).
  */
object Zones {

  /** Full-refresh write (TRUNCATE + INSERT parity). */
  def overwriteAll(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Upsert an increment into a partitioned table by rewriting only the
    * touched partitions: for each partition present in `increment`, the
    * new content = old rows whose key is absent from the increment ∪ the
    * increment (new version wins), written with dynamic partition
    * overwrite so untouched partitions are untouched.
    */
  def upsertPartitioned(
      spark: SparkSession,
      path: String,
      increment: DataFrame,
      keys: Seq[String],
      partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val exists = new java.io.File(path).exists()
    val merged =
      if (!exists) increment
      else {
        val current = spark.read.parquet(path)
        // restrict the anti-join to touched partitions: the partition
        // filter prunes the scan to those directories
        val touched = increment.select(col(partitionCol)).distinct()
        val touchedCurrent = current.join(touched, Seq(partitionCol), "left_semi")
        graft.operators.Upsert.upsert(touchedCurrent, increment, keys)
      }
    // per-write option (NOT the session conf): scoping dynamic overwrite
    // to this writer leaves later partitioned overwrites in the session
    // with the default truncate semantics
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Durable overwrite for read-modify-write cycles (new zone content is
    * computed FROM the current zone files): stage the full result to
    * `<path>.tmp`, then swap it over `path`. The staged write materializes
    * the plan while the old files still exist, so no checkpoint is needed;
    * unlike `localCheckpoint(true)` this keeps lineage recoverable on
    * executor loss, and the zone is never in a deleted-but-not-rewritten
    * state longer than one rename (atomic on HDFS-like filesystems).
    */
  def overwriteSwap(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    stage(df, path, partitionBy)
    commitSwap(df.sparkSession, path)
  }

  /** Stage-all-then-swap-all, for result plans that read EACH OTHER's
    * targets (e.g. the new dim_product scans the current dim_brand files):
    * every staged write still sees the old files of every zone; renames
    * happen only after all results are materialized.
    */
  def overwriteSwapAll(writes: Seq[(DataFrame, String)]): Unit = {
    writes.foreach { case (df, p) => stage(df, p, Nil) }
    writes.foreach { case (df, p) => commitSwap(df.sparkSession, p) }
  }

  private def stage(df: DataFrame, path: String, partitionBy: Seq[String]): Unit =
    // mode=overwrite also clears a leftover tmp dir from a crashed run
    overwriteAll(df, path + TmpSuffix, partitionBy)

  private def commitSwap(spark: SparkSession, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(target, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(path + TmpSuffix), target))
      throw new java.io.IOException(s"swap rename failed for $path")
  }

  private val TmpSuffix = ".__tmp__"

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
