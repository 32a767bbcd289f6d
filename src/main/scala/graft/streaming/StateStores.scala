package graft.streaming

import org.apache.spark.sql.SparkSession

/** One shared switch for the streaming state-store backend (r12 verdict
  * #4): the ingest-dedup operators' state is the corpus's content index
  * — it legitimately grows with DISTINCT content and never expires, the
  * one state shape guaranteed to exceed executor heap at corpus scale —
  * so the operators set the disk-backed RocksDB provider on the session
  * THEMSELVES (the [[StreamCounterRate]] precedent, where
  * transformWithState requires it) instead of documenting "RocksDB in
  * production" and defaulting to the in-memory HDFS-backed store. The
  * conf is read per-query at START, so setting it inside the transform
  * binds every sink built from it; a checkpoint keeps the provider it
  * started with (never switch providers on an existing checkpoint).
  * StreamingScaleSpec pins state rows AND the store type. */
object StateStores {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Set the RocksDB state-store provider on the session (idempotent). */
  def useRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      RocksDbProvider)
}
