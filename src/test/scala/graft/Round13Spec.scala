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

  // ------------------------------------------------------ graph_scc

  /** Iterative (explicit-stack) Tarjan over a driver-side edge list;
    * components relabeled by their smallest member so the comparison is
    * representation-free. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStack = scala.collection.mutable.Set.empty[Long]
    val stack = scala.collection.mutable.ArrayBuffer.empty[Long]
    var counter = 0
    val comp = scala.collection.mutable.Map.empty[Long, Long]
    for (root <- nodes if !index.contains(root)) {
      // frames: (node, iterator over its successors)
      val work = scala.collection.mutable.ArrayBuffer(
        (root, adj.getOrElse(root, Seq.empty).iterator))
      index(root) = counter; low(root) = counter; counter += 1
      stack += root; onStack += root
      while (work.nonEmpty) {
        val (v, it) = work.last
        var descended = false
        while (it.hasNext && !descended) {
          val w = it.next()
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack += w; onStack += w
            work += ((w, adj.getOrElse(w, Seq.empty).iterator))
            descended = true
          } else if (onStack(w)) low(v) = math.min(low(v), index(w))
        }
        if (!descended) {
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val p = work.last._1
            low(p) = math.min(low(p), low(v))
          }
          if (low(v) == index(v)) {
            val members = scala.collection.mutable.ArrayBuffer.empty[Long]
            var w = -1L
            while (w != v) {
              w = stack.remove(stack.length - 1); onStack -= w; members += w
            }
            val id = members.min
            members.foreach(m => comp(m) = id)
          }
        }
      }
    }
    comp.toMap
  }

  test("graph_scc: synthetic identities — a cycle is one SCC, a DAG is all singletons") {
    import spark.implicits._
    // 6-cycle + a 4-node DAG tail hanging off it + an isolated 2-path
    val cyc = (0L until 6L).map(i => (i, (i + 1) % 6))
    val tail = Seq((5L, 10L), (10L, 11L), (11L, 12L), (10L, 12L))
    val path = Seq((20L, 21L))
    val edges = (cyc ++ tail ++ path).toDF("src", "dst")
    val got = graft.ops.Analytics.sccFrom(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = tarjan(cyc ++ tail ++ path)
    assert(got == expected, s"scc mismatch: $got vs $expected")
    assert(got.filter(_._2 == 0L).keySet == (0L until 6L).toSet,
      "the 6-cycle must be one SCC labeled by node 0")
    assert(Seq(10L, 11L, 12L, 20L, 21L).forall(v => got(v) == v),
      "DAG/path nodes must be singleton SCCs")
  }

  test("graph_scc: two cycles joined one-way stay separate SCCs; a back edge merges them") {
    import spark.implicits._
    val c1 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val c2 = Seq((10L, 11L), (11L, 12L), (12L, 10L))
    val bridge = Seq((2L, 10L))
    val oneWay = graft.ops.Analytics.sccFrom(
      (c1 ++ c2 ++ bridge).toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oneWay == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    val backEdge = Seq((11L, 1L))
    val merged = graft.ops.Analytics.sccFrom(
      (c1 ++ c2 ++ bridge ++ backEdge).toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged.values.toSet == Set(0L),
      s"back edge must merge everything into SCC 0: $merged")
  }

  test("graph_scc equals a driver Tarjan on the sf0.01 purchase-sequence graph") {
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    import spark.implicits._
    val rows = li.as[(Long, Long, Long)].collect()
    val byOrder = rows.groupBy(_._1)
    // directed sequence counts; keep every observed direction of pairs
    // whose TOTAL (both-direction) count is >= 2 — graphScc's definition
    val dirCnt = byOrder.values.toSeq.flatMap { items =>
      for {
        a <- items.toSeq; b <- items.toSeq
        if a._2 < b._2 && a._3 != b._3
      } yield (a._3, b._3)
    }.groupBy(identity).map { case (k, v) => k -> v.size }
    val undTot = dirCnt.groupBy { case ((a, b), _) =>
      (math.min(a, b), math.max(a, b)) }
      .map { case (k, m) => k -> m.values.sum }
    val edges = dirCnt.keys.filter { case (a, b) =>
      undTot((math.min(a, b), math.max(a, b))) >= 2 }.toSeq
    val expected = tarjan(edges)
    val got = graft.ops.Analytics.graphScc(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap == expected,
      "scc labels differ from driver Tarjan")
    // scc_size column is consistent with the labeling
    val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    assert(got.forall(t => sizes(t._2) == t._3), "scc_size inconsistent")
    val nontrivial = sizes.values.count(_ > 1)
    info(s"sf0.01: ${expected.size} nodes, ${sizes.size} SCCs, " +
      s"$nontrivial non-singleton, largest ${sizes.values.max}")
    assert(sizes.values.max > 1, "fixture graph must contain a nontrivial SCC")
  }
}
