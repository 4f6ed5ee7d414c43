package graft

import org.apache.spark.sql.functions._

/** Round-13 pins: Holt–Winters skew replay, directed SCC vs a driver
  * Tarjan, ALS recommender invariants, and the composed ANN report. */
class Round13Spec extends SparkSpec {

  // ------------------------------------------------ ts_holt_winters

  test("ts_holt_winters under hot-user skew: one user owns 16x the events, replay is exact") {
    import spark.implicits._
    // the r12 hot-user layout: a bot user (7) with 16x the events of 30
    // normal users. The (user, day) pre-aggregate must absorb the skew
    // (the bot enters the fold as daily rows), and the fold must match a
    // driver replay of the identical recurrence bit-for-bit.
    val perNormal = 300
    val hot = (0 until 16 * perNormal).map { i =>
      (1000000L + i, 7L,
        new java.sql.Timestamp(1700000000000L + i.toLong * 7310017),
        "click", (i % 97).toDouble / 7.0)
    }
    val normal = (1 to 30).flatMap { u =>
      (0 until perNormal).map { i =>
        (2000000L + u * 10000L + i, 100L + u,
          new java.sql.Timestamp(1700000000000L + i.toLong * 60000017 + u),
          "view", (i % 31).toDouble / 3.0)
      }
    }
    val rows = hot ++ normal
    val tmp = java.nio.file.Files.createTempDirectory("graft-hotuser13").toString
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    // driver replay: UTC day buckets of exact cent sums, Monday-based
    // weekday slots, the identical dyadic recurrence
    val expected = rows.groupBy(_._2).map { case (u, es) =>
      val daily = es
        .groupBy(e => e._3.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate)
        .map { case (day, ds) =>
          (day, ds.map(e => math.floor(e._5 * 100 + 0.5).toLong).sum)
        }
        .toSeq.sortBy(_._1.toEpochDay)
      val sa = new Array[Double](7)
      var l = daily.head._2.toDouble / 100.0
      var b = 0.0
      var lastWd = daily.head._1.getDayOfWeek.getValue - 1
      daily.tail.foreach { case (day, cents) =>
        val v = cents.toDouble / 100.0
        val wd = day.getDayOfWeek.getValue - 1
        val sc = sa(wd)
        val l2 = 0.5 * (v - sc) + 0.5 * (l + b)
        b = 0.25 * (l2 - l) + 0.75 * b
        sa(wd) = 0.25 * (v - l2) + 0.75 * sc
        l = l2
        lastWd = wd
      }
      val sNext = sa((lastWd + 1) % 7)
      u -> (daily.length.toLong, r4(l), r4(b), r4(sNext), r4(l + b + sNext))
    }
    val got = graft.ops.Quant.tsHoltWinters(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got == expected,
      s"holt-winters skew replay mismatch (hot user: got ${got.get(7L)} " +
        s"expected ${expected.get(7L)})")
    // the hot user's fold input is daily rows, not events: 16x events
    // collapse to a bounded day count
    assert(got(7L)._1 < 16L * perNormal,
      "hot user's n_days should be day-bounded, not event-sized")
    // seasonality is actually learned: at least one seasonal slot moved
    assert(got.values.exists(t => t._4 != 0.0),
      "no user learned a non-zero seasonal component")
  }

  test("ts_holt_winters on the fixture: weekly seasonality beats Holt linear on seasonal users") {
    // sanity on real data: rows exist, one per user, and the seasonal
    // state is non-degenerate for a meaningful share of users
    val hw = graft.ops.Quant.tsHoltWinters(spark, sf01).collect()
    assert(hw.length > 0, "no output rows")
    assert(hw.map(_.getLong(0)).distinct.length == hw.length,
      "user_id not unique")
    val nonzero = hw.count(r => math.abs(r.getDouble(4)) > 1e-9)
    assert(nonzero > hw.length / 4,
      s"seasonal component degenerate: only $nonzero of ${hw.length} users")
  }
}
