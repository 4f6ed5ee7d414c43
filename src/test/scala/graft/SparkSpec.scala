package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM; sessions are cheap
  * to reuse, expensive to churn). sf0.001 keeps unit suites fast. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkSpec.session

  /** Row-for-row equality after sorting columns by name (the driver's
    * compare shape). */
  def assertSameRows(a: DataFrame, b: DataFrame, hint: String = ""): Unit = {
    val cols = a.columns.sorted
    assert(cols.toSeq == b.columns.sorted.toSeq, s"$hint column sets differ")
    val ra = a.select(cols.map(a(_)): _*).collect().map(_.toSeq)
    val rb = b.select(cols.map(b(_)): _*).collect().map(_.toSeq)
    assert(ra.length == rb.length, s"$hint row counts: ${ra.length} vs ${rb.length}")
    ra.zip(rb).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"$hint row $i differs: $x vs $y")
    }
  }

  override def afterAll(): Unit = {
    // keep the shared session alive, but assert no overlapped-job pool
    // thread outlived its call (r16 driver-test abort: an orphaned index
    // write raced a session teardown) — Pools.runAll awaits termination,
    // so anything still alive here is a leak.
    val live = Pools.liveWorkerNames()
    assert(live.isEmpty, s"graft pool threads outlived their call: $live")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
