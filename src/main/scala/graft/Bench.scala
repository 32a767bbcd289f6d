package graft

import org.apache.spark.sql.SparkSession

/** Headline bench: times every declared query at the driver-given SF and
  * prints the one-line JSON contract.
  *
  * Methodology: one untimed warm-up pass over all queries (codegen compile,
  * JIT, parquet footer cache), then two timed passes taking the per-query
  * minimum — the host VM shows multi-second I/O jitter bursts unrelated to
  * the plans (observed: identical 60k-row aggs ranging 0.2s..16s), so a
  * single cold pass measures the hypervisor, not the engine. The noop
  * sink forces evaluation of EVERY output column (a bare `count()` lets
  * Catalyst prune projection-only queries down to the scan, which would
  * flatter exactly the scalar/text operators the bench should measure)
  * while keeping result transfer off the clock.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    val queries = SparkEntry.queries
    // SPARK_GRAFT_BENCH_SKIP: comma-separated queries to exclude — for
    // big-fixture runs where a demo-regime query is infeasible by
    // geometry (d5's wide-band 0.45 threshold at 200k vectors emits
    // ~1e10 candidates; see BENCH_NOTES 100x findings). Default: none.
    val skip = sys.env.getOrElse("SPARK_GRAFT_BENCH_SKIP", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    // SPARK_GRAFT_BENCH_ONLY: comma-separated allow-list — targeted
    // re-timing of a few queries at a big fixture without paying for the
    // whole suite. Default: empty = all.
    val only = sys.env.getOrElse("SPARK_GRAFT_BENCH_ONLY", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    val names = SparkEntry.benchQueries.filterNot(skip)
      .filter(n => only.isEmpty || only(n))
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // Plan-shape metrics per query (r12 verdict #7): task count and
    // shuffle read/write bytes from a SparkListener, captured during
    // the UNTIMED warm-up pass (the metrics are a property of the plan
    // + data, not the host, so one capture suffices and the timed
    // passes stay listener-free). Deterministic where wall-clock is
    // not: a plan regression moves tasks/shuffle-bytes in the same
    // diff the 16-20% host-jitter band hides wall regressions in.
    val planListener = new org.apache.spark.scheduler.SparkListener {
      val tasks = new java.util.concurrent.atomic.AtomicLong
      val sRead = new java.util.concurrent.atomic.AtomicLong
      val sWrite = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          tasks.incrementAndGet()
          sRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          sWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      def reset(): Unit = { tasks.set(0); sRead.set(0); sWrite.set(0) }
    }
    // listenerBus is private[spark] = public in bytecode; drain it so
    // every task-end of the just-finished query is attributed to it
    def drainListenerBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch {
        // NonFatal only: swallowing InterruptedException would lose the
        // interrupt flag, and VM errors must propagate (r13 ADVICE).
        // Reflection may wrap the interrupt in an ITE — restore it.
        case e: java.lang.reflect.InvocationTargetException
            if e.getCause.isInstanceOf[InterruptedException] =>
          Thread.currentThread().interrupt()
        case scala.util.control.NonFatal(_) => Thread.sleep(300)
      }
    val planMetrics =
      scala.collection.mutable.LinkedHashMap[String, (Long, Long, Long)]()
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      } catch { case e: Throwable =>
        // a swallowed failure must not masquerade as a fast query
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // drop per-query pinned intermediates OFF the clock: every timed run
      // rebuilds its own caches (a warm cache surviving into the next timed
      // pass would flatter exactly the persist-using queries)
      spark.catalog.clearCache()
      sec
    }
    // warm-up pass doubles as the plan-metrics capture pass
    spark.sparkContext.addSparkListener(planListener)
    names.foreach { n =>
      drainListenerBus(); planListener.reset()
      timeOne(n)
      drainListenerBus()
      planMetrics(n) = (planListener.tasks.get, planListener.sRead.get,
        planListener.sWrite.get)
    }
    spark.sparkContext.removeSparkListener(planListener)
    // min-of-3 (r3 verdict #4): three same-code runs in one session ranged
    // 34–70 s on this host's bursty I/O, which cost a round of
    // false-regression analysis. The contract line keeps the min; the
    // spread (min, median, max) goes into BENCH_OUT.json so a judge can
    // separate plan changes from I/O weather without re-running.
    // SPARK_GRAFT_BENCH_PASSES=1 exists for one-shot big-fixture timing
    // (e.g. the 100x octave) — the driver's default contract is 3.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // each timed pass runs the registry in a DIFFERENT seeded order (r8
    // verdict #8): with a fixed order, one multi-second host-contention
    // window inflates the same registry-ADJACENT block in every pass, so
    // a whole query family looks regressed (the r8 q23–q37 and d7–d12
    // blocks). Shuffling per pass decorrelates wall-clock neighborhoods
    // from registry neighborhoods; min-of-passes per query is unchanged.
    val byPass = (0 until passes).map { p =>
      val order = new scala.util.Random(9973L * (p + 1)).shuffle(names)
      order.map(n => n -> timeOne(n)).toMap
    }
    val samples = names.map { n => n -> byPass.map(_(n)).sorted }
    val results = samples.map { case (n, s) => n -> s.head }
    // The driver keeps only the last 2000 chars of stdout and parses the
    // final line, so the contract line must (a) be last — no sbt epilogue
    // after it (build.sbt sets Global/showSuccess := false) and nothing
    // printed twice — and (b) fit the window: per-query times at 3 decimals
    // keep the 68-query line at ~1.7 KB (full double precision overflowed
    // the window in rounds 1-2 → `parsed: null`).
    def fmt(dec: Int)(v: Double): String =
      s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
    val total = results.map(_._2).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "errors" is a diagnostic beyond the driver contract — spend the 12
    // chars on it only when there IS an error to report
    val errsPart = if (failed.isEmpty) "" else s""","errors":$errs"""
    def render(f: Double => String, sf: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(3)(total)},"unit":"sec","queries":$qs$errsPart,"sf":"$sf"}"""
    }
    // The driver keeps the last 2000 stdout chars and parses the final
    // line, so the hard budget is 1999 incl. the trailing newline. If the
    // registry pushes the 3-decimal line past the 1980 comfort margin,
    // degrade per-query precision step-by-step (milli → centi →
    // deciseconds), then shorten sf to its basename at the full 1995
    // budget (the round-6 lesson: every full-path rung overflowed and the
    // whole per-query record silently vanished), and only as the very
    // last rung drop per-query detail — `{"queries":{}}` still parses,
    // where an overflowed line regresses the artifact to `parsed: null`.
    val sfShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    // last rung before giving up per-query detail entirely: keep the
    // MOST EXPENSIVE queries that fit the window (sorted desc by time —
    // they are the ones drift analysis needs) and say how many were cut.
    // At 123 queries even the 1-decimal line overflowed in r8 and the
    // driver artifact silently degraded to `{"queries":{}}` (r8 ADVICE).
    def renderTop(): String = {
      val desc = results.sortBy(-_._2)
      val kept = scala.collection.mutable.ListBuffer[(String, Double)]()
      def line(omitted: Int): String = {
        val qs = kept.map { case (k, v) => "\"" + k + "\":" + fmt(2)(v) }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${fmt(3)(total)},"unit":"sec","queries":$qs,"queries_omitted":$omitted$errsPart,"sf":"$sfShort"}"""
      }
      desc.foreach { kv =>
        kept += kv
        if (line(results.size - kept.size).length > 1980) kept.remove(kept.size - 1)
      }
      line(results.size - kept.size)
    }
    val json = Seq(render(fmt(3), sfDir), render(fmt(2), sfDir),
        render(fmt(1), sfDir)).find(_.length <= 1980)
      .orElse(Some(render(fmt(1), sfShort)).filter(_.length <= 1995))
      .orElse(Some(renderTop()).filter(_.length <= 1995))
      .getOrElse {
        s"""{"metric":"total","value":${fmt(3)(total)},"unit":"sec","queries":{}$errsPart,"sf":"$sfDir"}"""
      }
    // richer artifact on disk: ALWAYS the full-precision per-query map
    // (never the degraded stdout rung — round-6 lesson) plus the spread;
    // stdout stays the single contract line
    val spread = samples.map { case (k, s) =>
      "\"" + k + "\":[" + s.map(fmt(3)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // plan-shape record next to the wall times: diff plan_metrics
    // against the committed BENCH_OUT.json to separate code regressions
    // (tasks/shuffle bytes move) from host noise (they don't) —
    // BENCH_NOTES "plan-metrics check"
    val planJson = planMetrics.map { case (k, (t, sr, sw)) =>
      "\"" + k + s"""\":{"tasks":$t,"shuffle_read":$sr,"shuffle_write":$sw}"""
    }.mkString("{", ",", "}")
    val fileJson = render(fmt(3), sfDir).stripSuffix("}") +
      s""","spread":$spread,"plan_metrics":$planJson}"""
    // a targeted/filtered run must never replace the committed full-suite
    // baseline (r5 ADVICE: a 1-query run clobbered BENCH_OUT.json and the
    // 80-query spread baseline was lost) — route it to its own file.
    // Full runs land in BENCH_LAST.json (gitignored) by default for the
    // same reason one level up (r9 ADVICE/verdict #3): the driver's
    // per-round run used to overwrite the committed quiet-host baseline
    // in the worktree. Refreshing BENCH_OUT.json is now a deliberate
    // act: SPARK_GRAFT_BENCH_OUT=BENCH_OUT.json on a quiet-host
    // min-of-3 run.
    val outFile =
      if (only.nonEmpty || skip.nonEmpty) "BENCH_TARGETED.json"
      else sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), fileJson + "\n")
    // plan gate wired into the round loop (r13 verdict #7): every FULL
    // bench run diffs its just-captured plan shapes against the
    // committed baseline's, so a plan regression fails loudly at bench
    // close instead of waiting for a judge diff. Same tolerances as
    // tools/compare_plan_metrics.py (tasks ±20% or ±8 — AQE wiggle;
    // shuffle bytes ±25% or 4 MiB). Stderr + PLAN_GATE.json only; the
    // stdout contract line stays untouched.
    if (only.isEmpty && skip.isEmpty) try {
      val basePath = java.nio.file.Paths.get("BENCH_OUT.json")
      val baseNode = if (java.nio.file.Files.exists(basePath))
        new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(basePath.toFile).get("plan_metrics")
      else null
      if (baseNode != null) {
        val flagged = scala.collection.mutable.ListBuffer[String]()
        var compared = 0
        planMetrics.foreach { case (q, (t, sr, sw)) =>
          val b = baseNode.get(q)
          if (b != null) {
            compared += 1
            val bt = b.get("tasks").asLong()
            if (math.abs(t - bt) > math.max(8L, (0.2 * bt).toLong))
              flagged += s"$q: tasks $bt -> $t"
            Seq(("shuffle_read", b.get("shuffle_read").asLong(), sr),
                ("shuffle_write", b.get("shuffle_write").asLong(), sw))
              .foreach { case (k, bv, cv) =>
                if (math.abs(cv - bv) > math.max(4L << 20, (0.25 * bv).toLong))
                  flagged += s"$q: $k $bv -> $cv"
              }
          }
        }
        val line = if (flagged.isEmpty)
          s"plan shapes stable across $compared queries vs BENCH_OUT.json"
        else s"${flagged.size} plan-shape moves vs BENCH_OUT.json " +
          "(code change, not host noise): " + flagged.mkString("; ")
        System.err.println(s"[plan-gate] $line")
        val fl = flagged.map(s => "\"" + s.replace("\"", "'") + "\"")
          .mkString("[", ",", "]")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("PLAN_GATE.json"),
          s"""{"compared":$compared,"flagged":$fl}\n""")
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[plan-gate] skipped: ${e.getMessage}")
    }
    spark.stop()
    println(json)
  }
}
