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

  /** Extra per-variant streaming confs. The RocksDB variant turns on
    * changelog checkpointing — the production-recommended mode (commit
    * uploads the per-batch changelog instead of snapshotting the full
    * store; snapshots happen async in the background), which exercises
    * the changelog REPLAY path on every checkpoint recovery test. */
  protected def extraConf: Map[String, String] = Map.empty

  private val confKey = "spark.sql.streaming.stateStore.providerClass"
  private var saved: Map[String, Option[String]] = Map.empty
  private var savedSet = false

  override def beforeEach(): Unit = {
    super.beforeEach()
    if (!savedSet) {
      saved = (extraConf.keySet + confKey)
        .map(k => k -> spark.conf.getOption(k)).toMap
      savedSet = true
    }
    spark.conf.set(confKey, providerClass)
    extraConf.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  override def afterAll(): Unit = {
    if (savedSet) saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    super.afterAll()
  }
}
