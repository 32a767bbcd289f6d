package graft

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured local SparkSession.
  *
  * Config choices (scale rationale — see SURVEY.md §4):
  *  - shuffle.partitions = #cores locally; on a real cluster this is
  *    AQE-coalesced anyway (adaptive on).
  *  - nanosAsLong: the reference's data model is int64-nanosecond `time`
  *    (kompactor.ts:107, README sample values); Spark's TimestampType is
  *    µs so we keep ns as LongType end-to-end to avoid precision loss.
  *  - UTC session TZ for byte-stable timestamp semantics vs the oracle.
  *  - zstd output codec matches the reference sink (kompactor.ts:109).
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores).getOrCreate()
    graft.functions.GraftFunctions.register(s)
    quietBenignWarnings()
    s
  }

  /** WindowExec WARNs on every global (unpartitioned) window it runs.
    * Every surviving global window in this engine is provably tiny by
    * construction — per-shard count tables (CoreQueries a_scan offsets:
    * #shards rows), the LIMIT-100 vocab head (TextQueries.vocab), and
    * the sub-[[graft.operators.DistributedRank.SmallWindowRows]]
    * fallback — each carries the invariant in a site comment and the
    * large-input paths are plan-gated by PlanQualitySpec, so the warning
    * adds no signal here and used to dominate the bench stderr tail
    * (r6 verdict #7). Call AFTER setLogLevel: that resets the root
    * logger, this pins one logger below it. */
  def quietBenignWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder = b
    .appName("graft")
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Big shuffles should START wide and let AQE coalesce DOWN — the
    // cluster-correct direction (partition count follows data volume,
    // not core count). Locally the default stays = cores because wide
    // initial splits tax the iterative queries (d7/d10 fixpoints pay
    // per-round scheduling: measured +10 s across the sf0.1 suite at
    // 512); deep octaves (≥ 1M docs) set SPARK_GRAFT_INITIAL_PARTITIONS
    // to keep per-partition hash builds and sort spills bounded.
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      sys.env.getOrElse("SPARK_GRAFT_INITIAL_PARTITIONS", cores))
    // Partition count follows DATA VOLUME, not core count (guide §2.2 /
    // Spark's own recommendation for this flag): with the default
    // parallelismFirst=true every sub-MB shuffle still fans out to
    // ~cores partitions, so iterative operators (graph rounds, MMR
    // selection, window fixpoints) schedule hundreds of empty tasks per
    // query — measured 456 tasks for s14's 80-row pool and ~650 per
    // graph query at sf0.1. With false, AQE coalesces to the advisory
    // size. The advisory is the scale knob (env-parameterized):
    // production crawls set SPARK_GRAFT_ADVISORY_SHUFFLE_BYTES to
    // 64-256 MB (guide §9) so big shuffles land in the 100 MB-1 GB/
    // partition band. The local default is 256 KB, picked by TWO
    // interleaved A/Bs (bench.AqeAb + DedupIndexBench, BENCH_NOTES r19):
    // 1 MB was marginally faster on the query suite (19.17 vs 19.91 s
    // over the 12-query mix) but coalesced the artifact append/rebuild
    // stages to single tasks — append8 8.6 s vs 5.4, rebuild 7.0 vs
    // 4.6 — and the ingest path's walls matter as much as the query
    // bench. The floor (minPartitionSize) stays at the Spark default.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_ADVISORY_SHUFFLE_BYTES", "256k"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "zstd")
    .config("spark.sql.autoBroadcastJoinThreshold", (32L << 20).toString)
    // catalog state (bucketed-table metadata) lives outside the repo
    .config("spark.sql.warehouse.dir",
      s"${sys.props("java.io.tmpdir")}/graft-warehouse")
    .config("spark.ui.enabled", "false")
}
