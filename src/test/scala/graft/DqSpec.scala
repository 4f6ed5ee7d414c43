package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Analytics, LlmPipeline}

/** Data-quality + budget-selection operators. The fixtures are CLEAN, so
  * dq_profile's gated result is all-zero counters — detection itself is
  * proven here by injecting known-dirty rows and asserting each counter
  * picks up exactly its plant. */
class DqSpec extends SparkSpec {

  test("dq_profile counts exactly the injected violations") {
    import spark.implicits._
    val ev = Tables.events(spark, sf01)
    val t0 = new Timestamp(1700000000000L)
    val dirty = Seq(
      // 2 null values, 1 blank type, 3 negative values, 1 duplicated id
      (9000001L, t0, 1L, "click", Option.empty[Double], "{}"),
      (9000002L, t0, 1L, "click", Option.empty[Double], "{}"),
      (9000003L, t0, 1L, "", Some(1.0), "{}"),
      (9000004L, t0, 1L, "view", Some(-1.0), "{}"),
      (9000005L, t0, 1L, "view", Some(-2.0), "{}"),
      (9000006L, t0, 1L, "view", Some(-3.0), "{}"),
      (9000007L, t0, 1L, "view", Some(1.0), "{}"),
      (9000007L, t0, 1L, "view", Some(2.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val li = Tables.lineitem(spark, sf01)
    val orphanLi = Seq(888888888L, 888888889L).toDF("l_orderkey")
    val row = Analytics.dqProfileFrom(
        ev.select(dirty.columns.map(col): _*).unionByName(dirty),
        li.select(col("l_orderkey")).unionByName(orphanLi),
        Tables.orders(spark, sf01))
      .collect().head
    val base = ev.count()
    assert(row.getLong(0) === base + 8, "n_rows")
    assert(row.getLong(1) === 2L, "null_value")
    assert(row.getLong(2) === 1L, "blank_type")
    assert(row.getLong(3) === 3L, "neg_value")
    assert(row.getLong(4) === 1L, "dup_event_ids")
    assert(row.getLong(5) === 2L, "fk_orphans")
  }

  test("dq_profile on the clean fixtures: zero violations, full row count") {
    val row = Analytics.dqProfile(spark, sf01).collect().head
    assert(row.getLong(0) === Tables.events(spark, sf01).count())
    (1 to 5).foreach(i => assert(row.getLong(i) === 0L, s"counter $i nonzero"))
  }

  test("streaming DQ monitor (complete mode) == batch column checks after 3 batches") {
    // the monitoring shape: the same validation counters run as a
    // streaming aggregation (all-associative sums/counts), so the
    // complete-mode row after the last micro-batch must equal the batch
    // profile over the union of everything that arrived.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Option[Double])]
    val counters = mem.toDS().toDF("event_id", "event_type", "value")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("null_value"),
        sum(when(col("event_type") === "", 1L).otherwise(0L)).as("blank_type"),
        sum(when(col("value") < 0, 1L).otherwise(0L)).as("neg_value"))
    val q = counters.writeStream.format("memory").queryName("t_dq")
      .outputMode("complete").start()
    val batches = Seq(
      Seq((1L, "click", Some(1.0)), (2L, "", Some(2.0))),
      Seq((3L, "view", Option.empty[Double]), (4L, "view", Some(-5.0))),
      Seq((5L, "click", Some(3.0)), (6L, "", Option.empty[Double])))
    batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    q.stop()
    val row = spark.table("t_dq").collect().head
    assert(row.getLong(0) === 6L)
    assert(row.getLong(1) === 2L, "streamed null count")
    assert(row.getLong(2) === 2L, "streamed blank count")
    assert(row.getLong(3) === 1L, "streamed negative count")
  }

  test("corpus_budget_select: greedy-by-quality prefix per lang, budget respected") {
    val out = LlmPipeline.corpusBudgetSelect(spark, sf01)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getInt(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (lang, rows) =>
      // cumulative total never exceeds the budget and increments by n_tok
      val sorted = rows.sortBy(_._4)
      assert(sorted.last._4 <= 10000L, s"$lang over budget")
      assert(sorted.map(_._3.toLong).sum === sorted.last._4,
        s"$lang cumsum inconsistent")
      // the selection is a PREFIX of the quality order: every admitted doc
      // has quality >= every rejected doc's quality (doc_id tiebreak)
      val q = Tables.documents(spark, sf01)
        .select(col("doc_id"), col("lang"),
          graft.Det.round(
            size(array_distinct(split(col("text"), " "))).cast("double") /
              size(split(col("text"), " ")).cast("double"), 4).as("q"))
        .where(col("lang") === lang)
        .collect().map(r => (r.getLong(0), r.getDouble(2)))
      val admitted = rows.map(_._2).toSet
      val keyOf = q.map { case (id, qv) => id -> ((-qv, id)) }.toMap
      val worstIn = rows.map(r => keyOf(r._2)).max
      val bestOut = q.filterNot(t => admitted(t._1)).map(t => keyOf(t._1))
        .minOption
      bestOut.foreach { bo =>
        assert(Ordering[(Double, Long)].lt(worstIn, bo),
          s"$lang: a rejected doc outranks an admitted one")
      }
    }
  }
}
