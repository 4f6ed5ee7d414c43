package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-16 pins: Kinesis reshard semantics on the replay stand-in
  * (children gated on parent drain, per-key order across the split,
  * stream ≡ batch on the maintained table) and the co-order edge-kernel
  * memo contract (producer recomputes, consumers serve, DataFrame
  * fallback past the gate is identical). */
class Round16Spec extends SparkSpec {

  // ------------------------------------------- stream_reshard_replay

  test("stream_reshard_replay: children gated on parent drain; per-user order across the split; maintained table == batch twin") {
    import spark.implicits._
    val raw = graft.io.Tables.normalizeTs(
      spark.read.parquet(s"$sf001/events.parquet")).localCheckpoint()
    // The split boundary a real consumer learns from the reshard control
    // event — computed once, driver-side, on the same floor-epoch grid
    // as the shared kernel.
    val (mn, mx) = raw.agg(
      min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .as[(Long, Long)].head()
    val splitSec = mn + (mx - mn) / 2
    val assigned = ops.Streaming.reshardAssignAt(raw, splitSec)
      .localCheckpoint()
    // sanity: the split actually bisects the feed and shard 1 closed
    val eras = assigned.groupBy(col("era")).count()
      .as[(String, Long)].collect().toMap
    assert(eras.getOrElse("parent", 0L) > 0 && eras.getOrElse("child", 0L) > 0)

    val in = java.nio.file.Files.createTempDirectory("graft-reshard").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-reshard-ck").toString
    val ckOrd = java.nio.file.Files.createTempDirectory("graft-reshard-ck2").toString
    val envelope = io.EventSource.storedSchema.fieldNames.map(col)
    // Phase-1 files: ONE file per parent shard (0 and 1), rows in
    // (ts, event_id) order — the per-shard sequence-number order a
    // Kinesis shard delivers.
    Seq(0L, 1L).foreach { sh =>
      assigned.where(col("era") === "parent" && col("shard_id") === sh)
        .orderBy(col("ts"), col("event_id")).select(envelope: _*)
        .coalesce(1).write.parquet(s"$in/parent_s$sh")
    }

    def aggQuery(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(io.EventSource.storedSchema)
        .option("recursiveFileLookup", "true").parquet(in)
      ops.Streaming.reshardStreamAgg(
        ops.Streaming.reshardAssignAt(stream, splitSec))
        .writeStream.format("memory").queryName("t_reshard")
        .option("checkpointLocation", ck)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    }
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Long, String, Long)]() // (batchId, user_id, era, shard_id)
    def ordQuery(): org.apache.spark.sql.streaming.StreamingQuery = {
      val stream = spark.readStream.schema(io.EventSource.storedSchema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1).parquet(in)
      ops.Streaming.reshardAssignAt(stream, splitSec)
        .select(col("user_id"), col("era"), col("shard_id"))
        .writeStream.option("checkpointLocation", ckOrd)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          df.as[(Long, String, Long)].collect()
            .foreach { case (u, e, sh) => seen.add((bid, u, e, sh)) }
        }
        .trigger(Trigger.AvailableNow()).start()
    }

    // ---- drain 1: only the parent era is visible
    aggQuery().awaitTermination()
    ordQuery().awaitTermination()
    val drain1 = seen.toArray(Array.empty[(Long, Long, String, Long)])
    assert(drain1.nonEmpty && drain1.forall(_._3 == "parent"),
      "drain 1 must consume EXACTLY the parent era — children are gated " +
        "on parent drain")
    assert(drain1.length == eras("parent"))
    val maxParentBatch = drain1.map(_._1).max

    // ---- reshard: child-era files appear (shard 0 continues; shard 1
    // split into 2 and 3), stream restarts from the same checkpoint
    Seq(0L, 2L, 3L).foreach { sh =>
      assigned.where(col("era") === "child" && col("shard_id") === sh)
        .orderBy(col("ts"), col("event_id")).select(envelope: _*)
        .coalesce(1).write.parquet(s"$in/child_s$sh")
    }
    aggQuery().awaitTermination()
    ordQuery().awaitTermination()
    val all = seen.toArray(Array.empty[(Long, Long, String, Long)])
    val childRows = all.filter(_._3 == "child")
    assert(childRows.length == eras("child"))
    // The Kinesis ordering contract across the split: for every user,
    // all child-era rows arrive in strictly later micro-batches than
    // every parent-era row (batch ids continue across the restart).
    assert(childRows.forall(_._1 > maxParentBatch),
      "a child-era row was processed before the parent shard drained")
    val parentMaxByUser = drain1.groupBy(_._2).view.mapValues(_.map(_._1).max)
    childRows.foreach { case (bid, u, _, _) =>
      parentMaxByUser.get(u).foreach(pm =>
        assert(bid > pm, s"user $u: child-era batch $bid <= parent batch $pm"))
    }
    // Split correctness: shard 1 closed at the split; children only open
    // after it; shard 0 spans both eras untouched.
    assert(all.filter(_._4 == 1L).forall(_._3 == "parent"))
    assert(all.filter(r => r._4 == 2L || r._4 == 3L).forall(_._3 == "child"))

    // ---- the maintained table equals the batch twin on the streamable
    // columns (n_users is batch/oracle-only: exact distinct is not a
    // streaming aggregate)
    assertSameRows(
      spark.table("t_reshard")
        .orderBy(col("shard_id"), col("era")),
      ops.Streaming.reshardStreamAgg(
        ops.Streaming.reshardAssign(
          graft.io.Tables.events(spark, sf001)))
        .orderBy(col("shard_id"), col("era")),
      "reshard stream-batch parity")
    // and the full batch twin carries the same keys
    val twinKeys = ops.Streaming.streamReshardReplay(spark, sf001)
      .select(col("shard_id"), col("era")).as[(Long, String)].collect().toSet
    val streamKeys = spark.table("t_reshard")
      .select(col("shard_id"), col("era")).as[(Long, String)].collect().toSet
    assert(twinKeys == streamKeys && twinKeys.nonEmpty)
  }

  test("stream_reshard_replay: assignment is a pure function — crossJoin form == precomputed-split form; hash ranges partition") {
    import spark.implicits._
    val ev = graft.io.Tables.events(spark, sf001)
    val (mn, mx) = ev.agg(
      min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .as[(Long, Long)].head()
    val a = ops.Streaming.reshardAssign(ev)
      .select(col("event_id"), col("era"), col("shard_id"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val b = ops.Streaming.reshardAssignAt(ev, mn + (mx - mn) / 2)
      .select(col("event_id"), col("era"), col("shard_id"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // children partition the parent's key space: every user routed to
    // child 2 or 3 would have been on parent shard 1, and both children
    // are non-trivial at this sf
    val users = ops.Streaming.reshardAssign(ev)
      .select(col("user_id"), col("shard_id")).distinct()
      .as[(Long, Long)].collect()
    users.filter(u => u._2 == 2L || u._2 == 3L)
      .foreach { case (u, _) => assert(u % 2 == 1, s"user $u crossed shards") }
    assert(users.exists(_._2 == 2L) && users.exists(_._2 == 3L))
  }
}
