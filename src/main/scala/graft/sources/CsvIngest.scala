package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV landing-zone ingest replicating load_staging.py's semantics:
  *  - the crawler drops `products_raw_YYYY_MM_DD.csv` with a fixed
  *    18-column header (crawl.py:30-35); the loader picks the LATEST file
  *    by mtime (load_staging.py:25-32)
  *  - columns are aligned by NAME against the target table's schema —
  *    the CSV∩table intersection is inserted, extra CSV columns dropped,
  *    missing table columns NULL (load_staging.py:62-65,144-150's
  *    DESCRIBE-driven alignment, i.e. schema-on-read)
  *  - system columns (NGAY run timestamp, ID_CONFIG site id) are stamped
  *    by the loader, not the file (load_staging.py:147-150)
  */
object CsvIngest {

  /** The crawler's CSV header (crawl.py:30-35). */
  val crawlerColumns: Seq[String] = Seq(
    "ID", "TEN", "LINK", "LINK_ANH", "GIA_CU", "GIA_MOI", "KICH_THUOC_MAN_HINH",
    "RAM", "BO_NHO", "GIAM_GIA_SMEMBER", "GIAM_GIA_SSTUDENT", "GIAM_GIA_PHAN_TRAM",
    "COUPON", "QUA_TANG", "DANH_GIA", "DA_BAN", "SITE_NAME", "SITE_ID")

  /** Latest landing file by modification time (path resolution happens on
    * the driver — not an engine concern, SURVEY S2). Goes through the
    * Hadoop `FileSystem` API so a landing zone on HDFS/object storage
    * lists the same way a local directory does.
    */
  def latestByMtime(
      dir: String,
      prefix: String = "products_raw_",
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return None
    fs.listStatus(p)
      .filter(st => st.isFile &&
        st.getPath.getName.startsWith(prefix) && st.getPath.getName.endsWith(".csv"))
      .sortBy(_.getModificationTime)
      .lastOption.map(_.getPath.toString)
  }

  /** Read a headered CSV and align it to `target`: select the name
    * intersection, cast to the target types, fill absent target columns
    * with NULL. UTF-8 BOM in the first header cell is stripped (the
    * crawler writes utf-8-sig, crawl.py:296-298).
    */
  def readAligned(
      spark: SparkSession,
      path: String,
      target: StructType,
      stamps: Map[String, Column] = Map.empty): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
    val bomFree = raw.columns.headOption match {
      case Some(h) if h.startsWith("﻿") =>
        raw.withColumnRenamed(h, h.stripPrefix("﻿"))
      case _ => raw
    }
    val csvCols = bomFree.columns.toSet
    val aligned = target.fields.map { f =>
      if (stamps.contains(f.name)) stamps(f.name).cast(f.dataType).as(f.name)
      else if (csvCols.contains(f.name)) col(f.name).try_cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    bomFree.select(aligned.toSeq: _*)
  }
}
