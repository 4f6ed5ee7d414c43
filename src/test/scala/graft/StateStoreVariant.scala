package graft

import org.scalatest.{BeforeAndAfterAll, BeforeAndAfterEach}

/** Runs a suite's streaming tests under an explicit state-store backend.
  *
  * The provider is read from session conf at QUERY START, so pinning it
  * in `beforeEach` (not just `beforeAll`) is what makes the variant
  * airtight: `Stateful.sessionizeTws` must flip the session to RocksDB
  * for its own query (transformWithState needs multiple column
  * families), and without the per-test reset that flip would silently
  * leak into every later test of an HDFS-variant suite. `afterAll`
  * restores whatever the session had before the suite ran.
  */
trait StateStoreVariant extends BeforeAndAfterEach with BeforeAndAfterAll {
  this: SparkSpec =>

  /** Fully-qualified state-store provider this variant runs under. */
  protected def providerClass: String

  private val confKey = "spark.sql.streaming.stateStore.providerClass"
  private var saved: Option[String] = None
  private var savedSet = false

  override def beforeEach(): Unit = {
    super.beforeEach()
    if (!savedSet) { saved = spark.conf.getOption(confKey); savedSet = true }
    spark.conf.set(confKey, providerClass)
  }

  override def afterAll(): Unit = {
    if (savedSet) saved match {
      case Some(v) => spark.conf.set(confKey, v)
      case None => spark.conf.unset(confKey)
    }
    super.afterAll()
  }
}
