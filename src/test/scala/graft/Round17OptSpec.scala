package graft

/** Round-17 optimization pins: overlapped-job pool semantics (the r16
  * driver-test failure), plus cross-path equivalence pins for every
  * operator this round restructures. */
class Round17OptSpec extends SparkSpec {

  test("Pools.runAll awaits EVERY sibling before rethrowing the first failure") {
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val err = intercept[RuntimeException] {
      Pools.runAll("graft-test-pool", 3, Seq(
        () => { Thread.sleep(50); done.incrementAndGet(); () },
        () => throw new RuntimeException("boom-first"),
        () => { Thread.sleep(200); done.incrementAndGet(); () },
        () => { Thread.sleep(200); done.incrementAndGet(); () }))
    }
    assert(err.getMessage == "boom-first")
    // all three non-failing tasks ran to completion before the rethrow
    assert(done.get() == 3)
    // and no pool thread outlives the call
    assert(Pools.liveWorkerNames().isEmpty)
  }

  test("Pools.runAll rethrows the first failure by TASK order, not by time") {
    val err = intercept[RuntimeException] {
      Pools.runAll("graft-test-pool", 2, Seq(
        () => { Thread.sleep(150); throw new RuntimeException("slow-early") },
        () => throw new RuntimeException("fast-late")))
    }
    assert(err.getMessage == "slow-early")
  }

  test("Pools.mapAll preserves task order") {
    val out = Pools.mapAll("graft-test-pool", 3,
      (1 to 7).map(i => () => { Thread.sleep((7 - i) * 10L); i * i }))
    assert(out == (1 to 7).map(i => i * i))
  }
}
