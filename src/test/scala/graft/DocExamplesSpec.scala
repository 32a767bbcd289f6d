package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.Graft

/** Compiles AND runs the README "Quickstart" snippets against the test
  * corpus, then asserts the README blocks are verbatim copies of the code
  * here (modulo indentation) — so the docs cannot drift from a compiling,
  * passing example. If an edit here fails the binding test, update the
  * README block (or vice versa).
  */
class DocExamplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("quickstart: near-dup pairs, clustering, dedup") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // MinHash-LSH candidate pairs, verified by exact shingle Jaccard
    val pairs = Graft.nearDupPairs(docs)

    // cluster the pair graph; keep the smallest doc_id per cluster
    val clusters = Graft.connectedComponents(pairs.select("doc_a", "doc_b"))
    val losers = clusters
      .join(clusters.groupBy("component").agg(min("id").as("keep_id")),
        "component")
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as("doc_id"))
    val deduped = docs.join(losers, Seq("doc_id"), "left_anti")

    assert(pairs.count() > 0)
    assert(deduped.count() < docs.count())
    spark.catalog.clearCache()
  }

  test("quickstart: embedding near-dups and ANN") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // near-dup pairs at the production operating point (cosine >= 0.9):
    // narrow bands — 8 bands x 16 sign-bits (bits grow with log2(corpus),
    // see BENCH_NOTES.md for the measured scaling law)
    val dups = Graft.embeddingNearDups(emb, bands = 8, rowBits = 16,
      threshold = 0.9, dim = 64)

    // approximate nearest neighbors: top-3 by exact cosine within each
    // full-signature LSH bucket
    val neighbors = Graft.annTopK(emb, topK = 3, dim = 64)

    // sf0.01 has no 0.9-grade pairs — the schema is the contract here
    assert(dups.columns.toSeq == Seq("vec_a", "vec_b", "cosine"))
    assert(neighbors.count() > 0)
    spark.catalog.clearCache()
  }

  test("quickstart: persisted ANN index — build once, query many") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // build the IVF-PQ index ONCE (coarse cells + residual codes) as
    // parquet tables + a manifest — the write-once artifact a large
    // deployment serves every future query batch from
    val ixDir = Files.createTempDirectory("ann_index").toString
    Graft.buildAnnIndex(emb, ixDir, family = "ivfpq", dim = 64)

    // query the LOADED artifact — no rebuild, hash-identical rows to
    // the inline path (families: lsh | ivf | pq | sq8 | ivfpq)
    val neighbors = Graft.annIndexTopK(spark, ixDir, emb)

    // SERVE an out-of-corpus batch (the deployment path): NEW vectors
    // under their own ids, assigned against the STORED quantizers — the
    // batch broadcasts, the artifact never shuffles — then the tuning
    // loop's recall@k measured on that same serving path
    val batch = emb.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000000L).as("query_id"), col("embedding"))
    val topk = Graft.annIndexServe(spark, ixDir, batch, emb)
    val recall = Graft.annIndexServeRecall(spark, ixDir, emb, batch)

    // keep the index fresh: crash-safe incremental append with frozen
    // quantizers (delta dirs + atomic manifest commit; a batchId makes
    // streaming replays a durable no-op)
    Graft.appendAnnIndex(batch.withColumnRenamed("query_id", "vec_id"), ixDir)

    assert(neighbors.count() > 0)
    assert(topk.count() > 0 && recall.count() == 1)
    assert(graft.operators.AnnIndex.readManifest(spark, ixDir).n
      == spark.read.parquet(s"$dir/embeddings.parquet").count() + 8)
    spark.catalog.clearCache()
  }

  test("quickstart: persisted dedup pipeline — build once, consume many") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // build ONCE: signature scan + LSH/verify pair pass + component solve
    val dxDir = Files.createTempDirectory("dedup_index").toString
    Graft.buildDedupIndex(docs, dxDir)

    // every consumer is now a join against stored tables — the expensive
    // pipeline is not re-paid per call
    val split = Graft.dedupSplitFrom(spark, dxDir, docs) // q56, no rebuild
    val best = Graft.keepBestFrom(spark, dxDir, docs) // d10
    val ranks = Graft.pageRankFrom(spark, dxDir) // p1
    val comms = Graft.labelPropFrom(spark, dxDir) // p3

    // ingest: probe NEW docs read-only ("have we already got this?"),
    // then append them — d16's bipartite increment, crash-safe commits
    val newDocs = docs.filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    val seen = Graft.dedupServeNearDups(spark, dxDir, newDocs)
    Graft.appendDedupIndex(newDocs, dxDir)

    assert(split.count() == 3 && best.count() > 0)
    assert(ranks.count() > 0 && comms.count() > 0)
    assert(seen.count() >= 8) // exact clones: every new doc matches its twin
    assert(graft.operators.DedupIndex.load(spark, dxDir).manifest.n
      == docs.count() + 8)
    spark.catalog.clearCache()
  }

  test("quickstart: retrieval for RAG — hybrid fusion + MMR diversity") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // hybrid search: exact shared-shingle leg + exact cosine leg, fused
    // by reciprocal ranks (RRF needs no cross-scale score calibration)
    val hybrid = Graft.hybridSearch(docs, emb, nQueries = 8, topK = 3)

    // MMR: greedy relevance-minus-redundancy picks from the top-10 pool —
    // plain top-k hands the generator k near-copies; MMR demotes them
    val diverse = Graft.mmrRerank(emb, nQueries = 8, poolR = 10)

    assert(hybrid.count() == 24 && diverse.count() == 24)
    spark.catalog.clearCache()
  }

  test("quickstart: artifact-served retrieval and index maintenance") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // serve the RAG compositions from PERSISTED artifacts: vector
    // candidates from the ANN index, lexical overlap from the dedup
    // artifact's stored shingle sets — no corpus-text scan per call
    val annDir = Files.createTempDirectory("rag_ann").toString
    val dxDir = Files.createTempDirectory("rag_dedup").toString
    Graft.buildAnnIndex(emb, annDir, family = "ivf", dim = 64)
    Graft.buildDedupIndex(docs, dxDir)
    val queries = docs.join(emb.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .filter(col("doc_id") < 4)
      .select((col("doc_id") + 5000000L).as("query_id"), col("text"),
        col("embedding"))
    val hybrid = Graft.hybridSearchFrom(spark, annDir, dxDir, emb, queries)
    val diverse = Graft.mmrRerankFrom(spark, annDir, emb, queries)

    // the deployed filtered variant: hybrid top-k among the docs this
    // user may see — one keep-set pre-filters BOTH legs before ranking
    val keep = emb.filter(col("label") % 2 === 0).select("vec_id")
    val filtered = Graft.hybridSearchFromWhere(spark, annDir, dxDir, keep,
      emb, queries)

    // takedown: remove docs WITHOUT a rebuild — tombstones exclude them
    // from every consumer the instant the commit lands; the next
    // compaction (or rebuild) drops the rows physically (delete-then-
    // compact == rebuild-without, TakedownSpec). annDelete covers every
    // ANN family except sq8; streaming twins apply a removal-request
    // stream with a durable replay guard (StreamTakedownSpec).
    Graft.dedupDelete(spark, dxDir,
      spark.range(2).select(col("id").as("doc_id")))

    // maintenance: fold streaming delta dirs into slabs (contents
    // identical, crash-safe; opt into the bucket-partitioned posting/band
    // layout at deployment scale so small probes prune to their keys'
    // bucket dirs) and re-fit quantizers with an atomic swap. Streaming
    // sinks can trigger folds on the LIVE window via CompactionPolicy.
    // compactAnnIndex also folds pending takedown tombstones physically
    // for every family (lsh/ivf/pq via a frozen-quantizer version swap,
    // ivfpq through its delta fold — FlatTombstoneFoldSpec)
    Graft.compactDedupIndex(spark, dxDir)
    Graft.compactAnnIndex(spark, annDir)
    Graft.rebuildAnnIndex(emb, annDir)

    // every artifact mutation runs its heal/stage/commit section under a
    // create-exclusive commit lease with an epoch-CAS manifest commit:
    // two mutators racing on one artifact (ingest + takedown sinks,
    // rebuild vs a live append) either lose nothing or refuse loudly with
    // ConcurrentMutationException — re-run the loser against the fresh
    // state (MutatorRaceSpec; a silently lost takedown would be a legal
    // hazard, not a perf bug)

    // recall-targeted auto-tuning: walk nProbe/R against the measured
    // serving-path recall until the target is met; the chosen knobs land
    // in the manifest and every serve call defaults to them from then on.
    // annRecallCheck re-measures the tuned operating point after appends
    // and compactions; drift beyond the bound is the rebuildAndTune
    // trigger (re-fit + atomic swap + re-tune against the NEW geometry)
    val tuned = Graft.tuneAnnIndex(spark, annDir, emb,
      queries.select("query_id", "embedding"), targetRecall = 0.9)
    val drift = Graft.annRecallCheck(spark, annDir, emb,
      queries.select("query_id", "embedding"))
    if (drift.drifted)
      Graft.rebuildAndTuneAnnIndex(spark, annDir, emb,
        queries.select("query_id", "embedding"), targetRecall = 0.9)

    // retrieval QUALITY, not just recall-vs-exact: score a loaded index's
    // serving path against ground-truth (query_id, neighbor_id) relevance
    // pairs — per query nDCG@k and MRR, integer-exact (s17)
    val relevance = emb
      .select((col("vec_id") + 5000000L).as("query_id"), col("label"))
      .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
        "label")
      .select("query_id", "neighbor_id")
    val evalScores = Graft.retrievalEvalFromIndex(spark, annDir,
      queries.select("query_id", "embedding"), emb, relevance, k = 10)

    // a real GDPR/DMCA queue drives EVERY artifact from one checkpoint:
    // dedup artifact + ANN index + the published corpus dirs share one
    // batch high-water mark, a crash between two commits converges on
    // restart, and takedownStatus verifies every artifact excluded the
    // same id set (StreamTakedownAllSpec injects the crash)
    val corpusDir = Files.createTempDirectory("corpus").toString
    docs.write.mode("overwrite").parquet(s"$corpusDir/batch-seed")
    val queueDir = Files.createTempDirectory("removal_queue").toString
    val queueIds = spark.range(2).select(col("id"))
    queueIds.coalesce(1).write.mode("append").parquet(queueDir)
    val td = Graft.streamTakedownAll(spark, queueDir, Seq(dxDir),
      Seq(annDir), Seq(corpusDir),
      Files.createTempDirectory("takedown_ckpt").toString)
    td.processAllAvailable() // drain the queue (production: runs forever)
    val status = Graft.takedownStatus(spark, queueIds, Seq(dxDir),
      Seq(annDir), Seq(corpusDir)) // every row reports n_visible == 0
    td.stop()

    // a durable tokenizer: train once, encode ANY corpus under the
    // frozen merges (token budgets stay comparable across corpora)
    val bpeDir = Files.createTempDirectory("bpe").toString
    Graft.buildBpeIndex(docs, bpeDir)
    val encoded = Graft.bpeEncodeFrom(spark, bpeDir, docs)

    assert(hybrid.count() == 12 && diverse.count() == 12)
    assert(filtered.count() == 12)
    assert(encoded.count() == docs.count())
    assert(tuned.targetMet && tuned.recall >= 0.9)
    assert(!drift.drifted && drift.sampleMatches)
    assert(evalScores.collect().forall { r =>
      val n = r.getAs[Long]("ndcg_e6"); n >= 0L && n <= 1000000L
    })
    assert(status.collect().forall(_.getAs[Long]("n_visible") == 0L))
    spark.catalog.clearCache()
  }

  test("quickstart: ingest orchestration, reader pins, drift checks") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // the ingest twin of the takedown queue: ONE crawl stream
    // (document + embedding per row) lands in the dedup artifact + the
    // ANN index + the published corpus from a single checkpoint; a
    // crash between two commits converges on restart, and ingestStatus
    // verifies every artifact holds the same crawl set
    // (StreamIngestAllSpec injects the crash between the dedup commit
    // and the index append)
    val dxDir = Files.createTempDirectory("ingest_dedup").toString
    Graft.buildDedupIndex(docs, dxDir)
    val annDir = Files.createTempDirectory("ingest_ann").toString
    Graft.buildAnnIndex(emb, annDir, "ivfpq", dim = 64)
    val corpusDir = Files.createTempDirectory("ingest_corpus").toString
    docs.select("doc_id", "text").write.mode("overwrite")
      .parquet(s"$corpusDir/batch-seed")
    val crawl = docs.select("doc_id", "text")
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id")
      .filter(col("doc_id") < 8)
      .withColumn("doc_id", col("doc_id") + 1000000000L)
    val crawlDir = Files.createTempDirectory("crawl_queue").toString
    crawl.coalesce(1).write.mode("append").parquet(crawlDir)
    val ing = Graft.streamIngestAll(spark, crawlDir, Seq(dxDir),
      Seq(annDir), Seq(corpusDir),
      Files.createTempDirectory("ingest_ckpt").toString)
    ing.processAllAvailable() // drain the crawl (production: runs forever)
    val ingested = Graft.ingestStatus(spark,
      crawl.select(col("doc_id").as("id")),
      Seq(dxDir), Seq(annDir), Seq(corpusDir)) // every row: n_live == 8
    ing.stop()

    // or both convergence reports in ONE frame, one live-view scan per
    // artifact: n_live equal across rows ⇔ ingest converged, n_visible
    // all zero ⇔ takedowns converged
    val health = Graft.artifactHealth(spark,
      crawl.select(col("doc_id").as("id")), spark.range(0).select("id"),
      Seq(dxDir), Seq(annDir), Seq(corpusDir))

    // long reads survive maintenance: a pinned snapshot's files outlive
    // any number of folds/rebuilds until the pin is released or expires
    val pin = Graft.pinArtifactReader(spark, dxDir)
    // ... hold table views across compactions ...
    pin.release(spark)

    // geometry drift, manifest-only (cron-able): re-fold when the
    // corpus outgrew its slab layout
    val layout = Graft.dedupBandDriftCheck(spark, dxDir)
    if (layout.drifted) Graft.retuneDedupLayout(spark, dxDir)

    assert(ingested.collect().forall(_.getAs[Long]("n_live") == 8L))
    assert(health.collect().forall(r => r.getAs[Long]("n_live") == 8L &&
      r.getAs[Long]("n_visible") == 0L))
    assert(!layout.drifted) // fresh build: layout sized for this corpus
    spark.catalog.clearCache()
  }

  test("quickstart: quality signals and sequence packing") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // Gopher-style repetition filters, then fixed-budget sequence packing
    val signals = Graft.repetitionSignals(docs)
    val clean = docs.join(
      signals.filter(col("dup_3gram_frac") < lit(0.2)).select("doc_id"),
      "doc_id")
    val bins = Graft.packSequences(clean, budget = 2048L, stride = 1024L)

    assert(bins.count() > 0)
    spark.catalog.clearCache()
  }

  test("quickstart: cluster canonicalization and chunking") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // quality-aware canonicalization: each near-dup cluster keeps its
    // longest member (ties to the smallest doc_id)
    val best = Graft.keepBestPerCluster(docs)

    // context-window chunking: 64-token chunks overlapping by 16 —
    // model-sized training/RAG sequences, one explode, no shuffle
    val chunks = Graft.chunkDocuments(docs, window = 64L, overlap = 16L)

    assert(best.count() > 0)
    assert(chunks.count() >= docs.count()) // every doc gets >= 1 chunk
    spark.catalog.clearCache()
  }

  test("quickstart: semantic dedup, cross-corpus ingest, verify lenses") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // semantic dedup (SemDeDup): k-means cells, then drop any vector with
    // a lower-id cell-mate above the cosine threshold (size k ~ sqrt(n);
    // 0.45 is this corpus's planted near-dup level — production uses higher)
    val semDups = Graft.semanticDups(emb, k = 16, threshold = 0.45)

    // nightly ingest: dedup a crawl increment against the accepted corpus
    // (bipartite LSH join; the increment's band table broadcasts)
    val increment = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val crossDups = Graft.crossNearDupPairs(increment, corpus)

    // position-sensitive verify on the LSH candidates: edit distance
    // separates in-place edits from reorderings that fool Jaccard
    val editPairs = Graft.editDistancePairs(docs)

    // the Gopher rule set as one scan (flags bitmask, keep = flags == 0),
    // and bounded-memory heavy hitters over any column
    val quality = Graft.gopherFilter(docs)
    val hot = Graft.approxHeavyHitters(docs.select(col("source")), "source", k = 8)

    assert(semDups.count() > 0 && crossDups.count() > 0)
    assert(editPairs.count() > 0 && hot.count() > 0)
    assert(quality.count() == docs.count())
    spark.catalog.clearCache()
  }

  test("quickstart: as-of join (attribution)") {
    // Tables.events adapts whatever encoding the corpus carries (int64 ns
    // or parquet timestamp[us]) to one int64-ns `ts_ns` column. For time-
    // range reads use Tables.eventsBetween(spark, dir, loNs, hiNs): it
    // pushes the bounds to the parquet scan in the at-rest type (row-group
    // pruning); a filter on the derived ts_ns cannot push down.
    val events = graft.Tables.events(spark, dir)
    val views = events.filter(col("event_type") === "view")
    val purchases = events.filter(col("event_type") === "purchase")

    // most recent strictly-earlier view per purchase; both sides large =>
    // the range-bucketed strategy (here one hour of ns per bucket)
    val attributed = Graft.asOfJoinBucketed(purchases, views,
      key = "user_id", ts = "ts_ns", id = "event_id", value = "value",
      bucketWidth = 3600L * 1000000000L)

    assert(attributed.count() == purchases.count())
    spark.catalog.clearCache()
  }

  test("quickstart: compaction (dry run)") {
    val dataRoot = Files.createTempDirectory("graft_doc_compact").toString

    import graft.compact.CompactConfig

    // the reference engine's whole job: snapshot-metadata-driven parquet
    // compaction with crash-safe commit ordering (dryRun plans only)
    val reports = Graft.runCompaction(spark,
      CompactConfig(dataDir = dataRoot, dryRun = true))

    assert(reports.isEmpty) // empty root: nothing to compact
  }

  test("quickstart: streaming corpus ingest") {
    val landingDir = Files.createTempDirectory("graft_doc_landing").toString
    val outDir = Files.createTempDirectory("graft_doc_ingest").toString + "/out"
    Files.copy(Paths.get(s"$dir/documents.parquet"),
      Paths.get(s"$landingDir/batch0.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    // cross-batch fingerprint dedup + token-count quality gate over a
    // landing directory; AvailableNow drains it and stops
    val ingested = Graft.ingestCorpus(spark, landingDir, minTokens = 5)
    val query = ingested.writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    assert(spark.read.parquet(outDir).count() > 0)
  }

  test("quickstart: pure-SQL pipeline") {
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("documents")

    // one registration call; after it the whole pipeline is plain SQL
    Graft.registerDocPipelineSql(spark, docsView = "documents")

    // corpus after near-dup removal (keep the lower doc_id of each pair)
    val deduped = spark.sql("""
      SELECT d.* FROM documents d
      LEFT ANTI JOIN (SELECT doc_b FROM graft_near_dup_pairs) p
        ON d.doc_id = p.doc_b""")

    // quote/boilerplate inclusion (full-recall containment, d11)
    val quoted = spark.sql("""
      SELECT doc_a, doc_b FROM graft_containment
      WHERE greatest(cont_a, cont_b) >= 0.9""")

    // canonical doc per near-dup cluster + model-sized chunks
    val canon = spark.sql("SELECT component, keep_id FROM graft_keep_best")
    val chunks = spark.sql("""
      SELECT doc_id, count(1) AS n_chunks FROM graft_chunks GROUP BY doc_id""")

    assert(deduped.count() < spark.table("documents").count())
    assert(canon.count() > 0 && chunks.count() > 0 && quoted.count() >= 0)

    // the SQL views ARE the DataFrame operators — same rows exactly
    val viaDf = Graft.nearDupPairs(spark.table("documents"))
      .select("doc_a", "doc_b", "jaccard")
    val viaSql = spark.sql("SELECT doc_a, doc_b, jaccard FROM graft_near_dup_pairs")
    assert(viaSql.except(viaDf).isEmpty && viaDf.except(viaSql).isEmpty)
    spark.catalog.clearCache()
  }

  test("quickstart: perplexity filter, url dedup, change points") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // bigram-LM fluency scores (exact integer mean conditional —
    // thresholding avg_p6 IS the perplexity filter)
    val scored = Graft.ngramLmScores(docs)

    // URL canonicalization dedup: one survivor per canonical target
    val crawl = docs.select(col("doc_id"),
      concat(lit("https://www.example.com/item/"),
        (col("doc_id") % 100).cast("string"),
        lit("?utm_source=feed")).as("url"))
    val canonical = Graft.urlDedupGroups(crawl)

    // CUSUM change-point per user over exact integer cents
    val ev = graft.Tables.events(spark, dir)
    val changes = Graft.changePoints(
      ev.select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        round(col("value") * 100).cast("bigint").as("cents")),
      "user_id", "event_id", "ts_us", "cents")

    assert(scored.count() == docs.count())
    assert(canonical.count() == 100)
    assert(changes.count() == ev.select("user_id").distinct().count())
    spark.catalog.clearCache()
  }

  test("README quickstart blocks are verbatim copies of this spec's code") {
    val readme = new String(Files.readAllBytes(Paths.get("README.md")), UTF_8)
    val start = readme.indexOf("## Quickstart")
    assert(start >= 0, "README.md must have a '## Quickstart' section")
    val end = readme.indexOf("\n## ", start + 1) match {
      case -1 => readme.length; case i => i
    }
    val section = readme.substring(start, end)
    val blocks = raw"(?s)```scala\n(.*?)```".r
      .findAllMatchIn(section).map(_.group(1)).toSeq
    assert(blocks.size >= 6, s"expected >= 6 scala blocks, got ${blocks.size}")
    val self = new String(Files.readAllBytes(
      Paths.get("src/test/scala/graft/DocExamplesSpec.scala")), UTF_8)
    def norm(s: String) =
      s.linesIterator.map(_.trim).filter(_.nonEmpty).mkString("\n")
    val normSelf = norm(self)
    for (b <- blocks)
      assert(normSelf.contains(norm(b)),
        s"README block has drifted from DocExamplesSpec:\n$b")
  }
}
