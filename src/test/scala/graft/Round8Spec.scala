package graft

import org.apache.spark.sql.functions._
import graft.ops.Quant

/** Round-8 pins: approx tiers and scale-path variants added this round. */
class Round8Spec extends SparkSpec {

  test("analytics_pareto_approx: decile mass within epsilon of the exact form") {
    val exact = Quant.analyticsPareto(spark, sf01).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val approx = Quant.analyticsParetoApprox(spark, sf01).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(exact.nonEmpty, "vacuous: exact pareto produced no deciles")
    // same band structure and total population
    assert(approx.keySet == exact.keySet,
      s"decile sets differ: ${approx.keySet} vs ${exact.keySet}")
    assert(approx.values.map(_._1).sum == exact.values.map(_._1).sum,
      "approx bucketing lost or duplicated users")
    // sketch boundaries may shift band edges by at most the rank error
    // (n/10000 users per edge) — decile shares must stay within 2 pp
    exact.foreach { case (dec, (_, share, cum)) =>
      val (_, aShare, aCum) = approx(dec)
      assert(math.abs(aShare - share) < 0.02,
        s"decile $dec share $aShare vs exact $share")
      assert(math.abs(aCum - cum) < 0.02,
        s"decile $dec cum_share $aCum vs exact $cum")
    }
    // the Pareto read-off itself: top decile carries the largest share
    val topShare = approx(approx.keys.min)._2
    assert(approx.values.map(_._2).max == topShare,
      "top decile is not the largest band")
  }
}
