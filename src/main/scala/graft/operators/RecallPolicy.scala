package graft.operators

import org.apache.spark.sql.DataFrame

/** When a streaming sink re-measures serving recall and auto-retunes
  * (r14 verdict #5) — the [[CompactionPolicy]] precedent applied to
  * index QUALITY instead of index layout: appends and takedowns shift
  * the corpus under frozen quantizers, and without a policy the drift
  * sits until an operator cron runs [[AnnIndex.recallCheck]] by hand.
  *
  * Every `every`-th micro-batch the sink re-measures recall@k at the
  * tuned operating point against the live `store` (one exact top-k
  * over the sample plus one served batch — a single ladder rung, not
  * the ladder). Drift beyond `driftBoundM` (×1000) on the RECORDED
  * sample triggers [[AnnIndex.rebuildAndTune]] inside the stream: the
  * quantizers re-fit to the corpus as it is now, and the knob ladder
  * re-measured against the new geometry, so the NEXT batch serves at a
  * measured operating point. Drift on a DIFFERENT sample is ignored
  * (it may be sample shift, not index drift — the recallCheck
  * contract); the check simply reports clean and the operator decides.
  *
  * `store` and `sample` are Option-wrapped thunks (r15 verdict #7 —
  * no null foot-gun for callers who set `every` without them; the
  * policy is simply disabled until both are present), evaluated at
  * each check, so they can read live tables that the same stream
  * mutates (a static DataFrame would serve a stale file listing). The
  * retune is a full
  * re-fit — a multi-minute pause inside one micro-batch at production
  * scale; pick `every` so checks amortize, and prefer a dedicated
  * maintenance stream when the latency cliff matters. */
final case class RecallPolicy(every: Int = 0, driftBoundM: Long = 50L,
    targetRecall: Double = 0.9, topK: Int = 3,
    store: Option[() => DataFrame] = None,
    sample: Option[() => DataFrame] = None) {

  def enabled: Boolean = every > 0 && store.isDefined && sample.isDefined

  def due(batchId: Long): Boolean =
    enabled && batchId > 0 && batchId % every == 0

  /** Run the check (and the retune it asks for) if this batch is due.
    * Returns the tune result when a retune ran. An index with no
    * recorded tuning yet is SKIPPED (recallCheck re-measures the tuned
    * operating point; there is nothing to drift from until the first
    * tuneIndex) — a policy-enabled stream must not wedge on a
    * fresh-built index that nobody tuned yet. */
  def applyIfDue(spark: org.apache.spark.sql.SparkSession, dir: String,
      batchId: Long): Option[AnnIndex.TuneResult] =
    if (!due(batchId)) None
    else if (!AnnIndex.readManifest(spark, dir).params
        .contains("tuned_recall_m")) None
    else {
      val emb = store.get()
      val q = sample.get()
      val d = AnnIndex.recallCheck(spark, dir, emb, q, driftBoundM)
      if (d.drifted && d.sampleMatches)
        Some(AnnIndex.rebuildAndTune(spark, dir, emb, q, targetRecall,
          topK))
      else None
    }
}
