package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cleaning / typing transformations of the reference's `SP_ETL_Clean_Data`
  * stored procedure (reference: sql_script/db_control_sql.sql:165-207) and
  * the crawler's field normalizers (reference: crawl.py:195-244), re-expressed
  * as pure Catalyst column expressions so they stay inside whole-stage
  * codegen and push down around joins.
  *
  * Semantics preserved from the reference:
  *  - missing / unparseable numerics become -1, not NULL
  *    (db_control_sql.sql:181-194)
  *  - missing strings become 'Unknown' (db_control_sql.sql:178-180)
  *  - missing date-dim lookup becomes surrogate key 0 (db_control_sql.sql:195)
  *  - MySQL CAST of garbage raises and is caught by COALESCE; Spark cast of
  *    garbage yields NULL — so every cast is wrapped coalesce(cast, sentinel)
  *    to match (SURVEY.md F5).
  */
object Clean {

  /** F3 — price normalization: strip thousands dots/commas, currency marks
    * (đ, ₫) and whitespace, then cast; unparseable/empty → -1.
    * Reference: db_control_sql.sql:181-186.
    */
  def parsePrice(c: Column): Column =
    coalesce(
      nullif(regexp_replace(c, "[.,đ₫\\s]", ""), lit("")).try_cast(DecimalType(18, 2)),
      lit(-1).cast(DecimalType(18, 2)))

  /** Price parse to integral units (for testdata-shaped fixtures where the
    * raw string carries a whole number of đồng).
    */
  def parsePriceLong(c: Column): Column =
    coalesce(
      nullif(regexp_replace(c, "[.,đ₫\\s]", ""), lit("")).try_cast("long"),
      lit(-1L))

  /** F4 — numeric screen-size extraction from strings like "6.9 inches".
    * Reference: db_control_sql.sql:188 (REGEXP_SUBSTR).
    */
  def parseScreenSize(c: Column): Column =
    coalesce(
      nullif(regexp_extract(c, "[0-9]*\\.?[0-9]+", 0), lit("")).try_cast(DecimalType(4, 2)),
      lit(-1).cast(DecimalType(4, 2)))

  /** F3 — RAM / storage "8 GB" → 8; strip GB and spaces, cast, -1 fallback.
    * Reference: db_control_sql.sql:191-193.
    */
  def parseGb(c: Column): Column =
    coalesce(
      nullif(regexp_replace(c, "(?i)gb|\\s", ""), lit("")).try_cast("int"),
      lit(-1))

  /** F10 — RAM-vs-storage disambiguation: a combined field "8 GB - 256 GB"
    * splits on " - "; a single value ≥ 64 is storage, else RAM.
    * Reference: crawl.py:218-228. Returns (ram, storage).
    */
  def splitRamStorage(c: Column): (Column, Column) = {
    val parts = split(c, " - ")
    val first = parseGb(element_at(parts, 1))
    val second = parseGb(when(size(parts) >= 2, element_at(parts, 2)))
    val ram = when(size(parts) >= 2, first)
      .otherwise(when(first >= 64, lit(-1)).otherwise(first))
    val storage = when(size(parts) >= 2, second)
      .otherwise(when(first >= 64, first).otherwise(lit(-1)))
    (ram, storage)
  }

  /** F1 — '' or NULL string → 'Unknown'. Reference: db_control_sql.sql:178-180. */
  def defaultUnknown(c: Column): Column =
    coalesce(nullif(c, lit("")), lit("Unknown"))

  /** F8 — brand classification: first-match-wins substring rules over the
    * lowercased product name; no match → 'Khác' ("Other").
    * Reference: load_dwh.py:142-153.
    */
  val brandRules: Seq[(String, String)] = Seq(
    "iphone" -> "Apple", "samsung" -> "Samsung", "xiaomi" -> "Xiaomi",
    "oppo" -> "OPPO", "vivo" -> "Vivo", "realme" -> "Realme",
    "nokia" -> "Nokia", "asus" -> "ASUS")

  def classifyBrand(name: Column, rules: Seq[(String, String)] = brandRules): Column = {
    val lowered = lower(name)
    rules.foldRight(lit("Khác"): Column) { case ((needle, brand), acc) =>
      when(lowered.contains(needle), lit(brand)).otherwise(acc)
    }
  }

  /** F9 — URL normalization: prefix relative links with the site base URL.
    * Reference: crawl.py:197-200.
    */
  def normalizeUrl(link: Column, base: Column): Column =
    when(link.isNull or link === "", lit("Unknown"))
      .when(!link.startsWith("http"), concat(base, link))
      .otherwise(link)

  /** P2 — quality filter: keep rows whose key text fields carry substance.
    * Reference: db_control_sql.sql:199 (LENGTH(TEN)+LENGTH(LINK)+LENGTH(LINK_ANH) > 10).
    */
  def qualityFilter(cols: Seq[Column], minLen: Int = 10): Column =
    cols.map(c => length(coalesce(c, lit("")))).reduce(_ + _) > minLen
}
