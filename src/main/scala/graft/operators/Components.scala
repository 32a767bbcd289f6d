package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the final step of
  * web-scale dedup (collapse verified near-dup pairs into keep-one
  * clusters).
  *
  * Shape: iterative min-label propagation PLUS pointer jumping
  * (`label ← label(label)`) each round, so convergence is O(log
  * diameter) rounds rather than O(diameter) — a million-node chain
  * converges in ~20 rounds instead of a million. Each round is two
  * joins + one aggregate on the (small) labels table; the driver-side
  * loop is bounded control flow, not data movement. Labels only
  * decrease, so fixpoint ⇔ sum(label) unchanged — one cheap scalar agg
  * per round on the cached result instead of a diff join. Superseded
  * rounds are unpersisted as soon as their successor materializes.
  */
object Components {

  /** @param pairs edge list with two long columns (left, right)
    * @return (id, component) — component = min node id of the cluster.
    *         The result is persisted (MEMORY_AND_DISK): it is the last
    *         round's fixpoint cache and recomputing it would replay every
    *         round through the RDD lineage. The CALLER owns that cache —
    *         `unpersist()` it when done (the [[graft.Graft]] facade
    *         returns a checkpointed copy and releases it instead). All
    *         intermediate caches are dropped on every exit path,
    *         including mid-loop failures and the non-convergence throw. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // each round references the previous result 3× (propagate + both
    // sides of the jump self-join): without cutting the lineage the
    // LOGICAL plan of round k holds ~3^k copies of round 0's tree (OOMs
    // the driver before round 10). `asLeaf` re-roots a materialized round
    // on a LogicalRDD leaf, so every round's plan has constant depth —
    // the iterative-DataFrame equivalent of GraphX's checkpoint cadence.
    def asLeaf(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
    val p = pairs.toDF("doc_a", "doc_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE the multi-leg references below: the first round
    // action references edges twice (both union legs) and each edge leg
    // references p — unfilled, the legs race to build the caches, each
    // replaying the upstream pair pipeline (CacheDisciplineSpec / r8)
    p.count()
    // undirected: propagate both ways
    val edges = p.unionAll(
      p.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count() // reads p's cache; round legs then read this one
    // round 0 folds the first propagation: label = min(id, neighbors)
    var labels = asLeaf(
      edges.select(col("doc_a").as("id"), col("doc_b").as("label"))
        .unionAll(edges.select(col("doc_a").as("id"), col("doc_a").as("label")))
        .groupBy(col("id")).agg(min(col("label")).as("label")))
    def labelSum(df: DataFrame): Long = // coalesce: sum over zero rows is null
      df.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    // every exit path — success, mid-loop failure, non-convergence —
    // releases p, edges, and any superseded round; only the RETURNED
    // labels cache survives (ownership documented above)
    try {
      var prevSum = labelSum(labels)
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxRounds) {
        val viaEdges = edges
          .join(labels, edges("doc_a") === labels("id"))
          .select(col("doc_b").as("id"), col("label"))
        val propagated = labels.select(col("id"), col("label")).unionAll(viaEdges)
          .groupBy(col("id")).agg(min(col("label")).as("label"))
        // pointer jump: label ← label(label); every label value is itself a
        // node id present in `propagated`, both sides keyed on unique ids →
        // the left join is 1:1 and coalesce keeps roots fixed
        val next = asLeaf(propagated.as("x")
          .join(propagated.select(col("id").as("jid"), col("label").as("jlabel")).as("y"),
            col("x.label") === col("y.jid"), "left")
          .select(col("x.id"), coalesce(col("y.jlabel"), col("x.label")).as("label")))
        val nextSum = // materializes `next`'s cache...
          try labelSum(next)
          catch { case t: Throwable => next.unpersist(); throw t }
        labels.unpersist() // ...so the superseded round can go
        converged = nextSum == prevSum
        prevSum = nextSum
        labels = next
        rounds += 1
      }
      // silent divergence would surface only as an opaque downstream
      // mismatch — fail loudly. With pointer jumping this needs a graph of
      // diameter > 2^maxRounds, i.e. never in practice.
      if (!converged)
        throw new IllegalStateException(
          s"connected-components did not converge within $maxRounds rounds")
    } catch {
      case t: Throwable => labels.unpersist(); throw t
    } finally {
      p.unpersist()
      edges.unpersist()
    }
    labels.withColumnRenamed("label", "component")
  }
}
