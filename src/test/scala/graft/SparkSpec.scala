package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + fixture access + row-set comparison for specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = {
    val s = Sessions.builder("graft-test", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = () // one JVM-wide session across suites

  def fixture(name: String): DataFrame =
    spark.read.parquet(s"src/test/resources/fixtures/$name.parquet")

  /** Assert the first sort-merge/hash join in `df`'s physical plan keeps
    * its LEFT (zone/big) side shuffle-free and bucketed — the invariant
    * bucketed zones exist to provide. Structural, not textual: exchanges
    * on the small side are expected and ignored.
    */
  def assertZoneSideUnshuffled(df: DataFrame, label: String): Unit = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val zoneSide: Option[SparkPlan] = root.collectFirst {
      case j: SortMergeJoinExec => j.left
      case j: ShuffledHashJoinExec => j.left
    }
    assert(zoneSide.nonEmpty, s"$label: no shuffled join in plan:\n$root")
    val side = zoneSide.get
    assert(side.collectFirst { case e: ShuffleExchangeExec => e }.isEmpty,
      s"$label: zone side shuffles:\n$side")
    assert(
      side.collectFirst { case f: FileSourceScanExec if f.bucketedScan => f }.nonEmpty,
      s"$label: zone side not a bucketed scan:\n$side")
  }

  /** Order-insensitive whole-frame equality with readable diffs. Decimals
    * are normalized to double, timestamps to ISO strings.
    */
  def assertSameRows(got: DataFrame, expected: DataFrame, label: String): Unit = {
    def canon(df: DataFrame): Seq[String] = {
      val cols = df.columns.sorted.map { c =>
        df.schema(c).dataType.typeName match {
          case t if t.startsWith("decimal") => col(c).cast("double").cast("string")
          case "timestamp" | "timestamp_ntz" => date_format(col(c), "yyyy-MM-dd HH:mm:ss")
          case _ => col(c).cast("string")
        }
      }
      df.select(concat_ws("", cols.map(c => coalesce(c, lit("∅"))): _*))
        .collect().map(_.getString(0)).sorted.toSeq
    }
    assert(got.columns.sorted.toSeq == expected.columns.sorted.toSeq,
      s"$label: column sets differ")
    val g = canon(got)
    val e = canon(expected)
    val missing = e.diff(g).take(3)
    val extra = g.diff(e).take(3)
    assert(g == e,
      s"$label: ${g.size} got vs ${e.size} expected rows; missing=$missing extra=$extra")
  }
}
