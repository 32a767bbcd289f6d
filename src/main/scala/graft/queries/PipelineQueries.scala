package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.XHash
import graft.operators.TextOps

/** Training-data pipeline operators beyond dedup/similarity: the steps a
  * pretraining corpus build runs between raw documents and tokenized
  * batches — intra-document repetition signals (quality filtering),
  * benchmark decontamination, stratified sampling for mixture weights,
  * and fixed-budget sequence packing. All oracle-gated; all shapes are
  * one-or-two-shuffle plans that hold at corpus scale.
  */
object PipelineQueries {

  /** Gopher/RefinedWeb-style repetition signals per document: the
    * most-frequent-token fraction and the duplicate 3-gram fraction.
    * One token explode → (doc, token) counts → per-doc max/sum in a
    * second hash-agg (same layout as d4's bit votes: partial aggs both
    * sides of one shuffle); the n-gram side never explodes — distinct
    * count comes from the codegen'd WordShingles array length. */
  private[graft] def repetition(docs: DataFrame): DataFrame = {
    val tokCounts = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_tok_n"), sum(col("c")).as("n_tokens"))
    val grams = docs.select(col("doc_id"),
      size(TextOps.shingles(col("text"))).cast("bigint").as("n_distinct_3grams"),
      greatest(size(TextOps.tokens(col("text"))) - 2, lit(0))
        .cast("bigint").as("n_3grams"))
    tokCounts.join(grams, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("top_tok_n"),
        // exact int64s into one IEEE division => bit-identical cross-engine
        (col("top_tok_n").cast("double") / col("n_tokens").cast("double"))
          .as("top_tok_frac"),
        when(col("n_3grams") === 0, lit(0.0))
          .otherwise((col("n_3grams") - col("n_distinct_3grams")).cast("double") /
            col("n_3grams").cast("double"))
          .as("dup_3gram_frac"))
  }
  private val repetitionSql =
    s"""WITH tok AS (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS t
       |  FROM documents),
       |cnt AS (SELECT doc_id, t, COUNT(1) AS c FROM tok GROUP BY 1, 2),
       |per AS (SELECT doc_id, MAX(c) AS top_tok_n,
       |  CAST(SUM(c) AS BIGINT) AS n_tokens FROM cnt GROUP BY 1),
       |g AS (SELECT doc_id,
       |  CAST(len(${TextOps.shinglesSql("text")}) AS BIGINT) AS n_distinct_3grams,
       |  CAST(greatest(len(${TextOps.tokensSql("text")}) - 2, 0) AS BIGINT) AS n_3grams
       |  FROM documents)
       |SELECT per.doc_id, n_tokens, top_tok_n,
       |  CAST(top_tok_n AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_tok_frac,
       |  CASE WHEN n_3grams = 0 THEN 0.0
       |    ELSE CAST(n_3grams - n_distinct_3grams AS DOUBLE) / CAST(n_3grams AS DOUBLE)
       |  END AS dup_3gram_frac
       |FROM per JOIN g ON g.doc_id = per.doc_id""".stripMargin

  /** Benchmark decontamination: corpus documents sharing ≥1 n-gram with
    * the (deterministic) eval holdout `doc_id % 97 == 0`. The holdout's
    * shingle set is small by construction → broadcast; the corpus side
    * streams through one explode + broadcast-hash join, then one
    * aggregation by document. Production decontamination uses longer
    * n-grams (8–13); 3 here because the test corpus is short-doc. */
  private[graft] def contamination(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("g"))
    val eval = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), col("g"))
    sh.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(eval), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }
  private val contaminationSql =
    s"""WITH sh AS (SELECT doc_id, unnest(${TextOps.shinglesSql("text")}) AS g
       |  FROM documents),
       |ev AS (SELECT doc_id AS eval_id, g FROM sh WHERE doc_id % 97 = 0)
       |SELECT sh.doc_id,
       |  COUNT(DISTINCT sh.g) AS n_shared_grams,
       |  COUNT(DISTINCT eval_id) AS n_eval_docs
       |FROM sh JOIN ev USING (g)
       |WHERE sh.doc_id % 97 <> 0
       |GROUP BY 1""".stripMargin

  /** Decontamination against a USER-PROVIDED eval set (columns doc_id,
    * text) — the production shape: eval suites are fixed benchmark
    * corpora, so their shingle set is bounded and broadcastable at ANY
    * corpus scale. The declared d8 query keeps the deterministic %97
    * holdout (corpus-proportional, oracle-expressible); this is the
    * entry a real pipeline calls with its benchmark suite. */
  private[graft] def contaminationAgainst(docs: DataFrame,
      evalDocs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("g"))
    val ev = evalDocs
      .select(col("doc_id").as("eval_id"),
        explode(TextOps.shingles(col("text"))).as("g"))
    sh.join(broadcast(ev), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_shared_grams"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Decontamination with a BLOOM-PREFILTERED exact join (d13) — the
    * scale path for eval suites too large to broadcast as raw gram sets
    * (d8's shape): a [[graft.functions.BloomAgg]] bitset of the eval
    * grams (fixed size — 2^27 bits is 16 MB for ~10^9 grams at ~1% FP)
    * broadcasts as ONE row; the corpus side probes it with a codegen'd
    * k-bit test and only survivors (true hits + the FP percent) enter
    * the shuffle-pinned exact join. False negatives are impossible, so
    * the output is IDENTICAL to the plain exact join — the oracle is the
    * exact SQL, and the gate proves the identity, not just plausibility.
    * Grams travel as md5-60 hashes end to end (8 B/gram, same hash in
    * the oracle). */
  private def hashedGrams(docs: DataFrame, idAs: String): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("g"))
      .select(col("doc_id").as(idAs), XHash.hash60(col("g")).as("gh"))

  private def bloomDecontamCore(corpus: DataFrame, ev: DataFrame,
      bits: Int): DataFrame = {
    val bloom = ev.agg(graft.functions.BloomAgg.agg(bits)(col("gh")).as("bf"))
      .select(col("bf.words").as("bw"))
    corpus.crossJoin(broadcast(bloom)) // one bitset row, bounds-frame idiom
      .filter(graft.functions.BloomContains(col("bw"), col("gh")))
      // project the bitset away BEFORE the exchange: survivors shuffle as
      // (doc_id, gh) pairs, never carrying the bloom words
      .select(col("doc_id"), col("gh"))
      .join(ev.hint("shuffle_hash"), "gh")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gh")).as("n_shared_grams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
  }

  private[graft] def bloomDecontam(docs: DataFrame,
      bits: Int = graft.functions.Bloom.DefaultBits): DataFrame = {
    val sh = hashedGrams(docs, "doc_id")
    bloomDecontamCore(
      sh.filter(col("doc_id") % 97 =!= 0),
      sh.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("eval_id"), col("gh")),
      bits)
  }

  /** d13's production entry: decontaminate against a USER-PROVIDED eval
    * suite (columns doc_id, text) through the bloom prefilter — for eval
    * gram sets beyond [[contaminationAgainst]]'s raw-broadcast budget.
    * Output rows identical to the exact join at any `bits`. */
  private[graft] def bloomDecontamAgainst(docs: DataFrame,
      evalDocs: DataFrame,
      bits: Int = graft.functions.Bloom.DefaultBits): DataFrame =
    bloomDecontamCore(hashedGrams(docs, "doc_id"),
      hashedGrams(evalDocs, "eval_id"), bits)
  private val bloomDecontamSql =
    s"""WITH sh AS (SELECT doc_id, ${XHash.hash60Sql("g")} AS gh
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("text")}) AS g
       |        FROM documents)),
       |ev AS (SELECT doc_id AS eval_id, gh FROM sh WHERE doc_id % 97 = 0)
       |SELECT sh.doc_id,
       |  COUNT(DISTINCT sh.gh) AS n_shared_grams,
       |  COUNT(DISTINCT eval_id) AS n_eval_docs
       |FROM sh JOIN ev USING (gh)
       |WHERE sh.doc_id % 97 <> 0
       |GROUP BY 1""".stripMargin

  /** Stratified deterministic sampling — per-stratum rates (training-mix
    * weights) from the same hash-split family as q31: reproducible across
    * engines, runs and cluster sizes, pushed to the scan as a plain
    * filter, no shuffle beyond the verifying aggregate. */
  private def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val permille = typedLit(Map("A" -> 100, "N" -> 50))
    // coalesce mirrors the oracle's CASE ... ELSE exactly: any stratum
    // not in the map gets the default rate instead of silently dropping
    Tables.lineitem(s, d)
      .filter(XHash.hash60(concat_ws("_",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string")))
        % 1000 < coalesce(element_at(permille, col("l_returnflag")), lit(200)))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("l_quantity").cast("decimal(25,2)")).cast("double").as("sum_qty"))
  }
  private val stratifiedSampleSql =
    s"""SELECT l_returnflag, COUNT(1) AS n_sampled,
       |  ${Q.moneySum("l_quantity")} AS sum_qty
       |FROM lineitem
       |WHERE ${XHash.hash60Sql(
            "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)")} % 1000
       |  < CASE l_returnflag WHEN 'A' THEN 100 WHEN 'N' THEN 50 ELSE 200 END
       |GROUP BY 1""".stripMargin

  /** Sequence packing: assign documents (per language, in doc_id order)
    * to fixed token-budget training bins by prefix-sum offset — the
    * distributed, deterministic form of next-fit packing (a document's
    * bin is its starting offset div budget).
    *
    * The prefix sum is the TWO-PASS DISTRIBUTED SCAN, not a naive
    * per-language window: `Window.partitionBy(lang)` makes one sequential
    * partition per language — a handful of languages over a 100 TB corpus
    * is a handful of straggler tasks. Instead: shard by doc_id stride,
    * (1) local cumsum within each (lang, shard) — thousands of small
    * parallel window partitions, (2) per-shard totals → cumulative shard
    * offsets (a window over the TINY shard-totals table), (3) join the
    * offsets back. global_cum = local_cum + shard_offset, exactly. */
  private[graft] def sequencePack(docs: DataFrame, budget: Long = 2048L,
      stride: Long = 1024L): DataFrame = {
    val base = docs
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"),
        expr(s"doc_id div $stride").as("shard"))
    val wLocal = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)
    val local = base.withColumn("local_cum", sum(col("n_tok")).over(wLocal))
    val wShard = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tok")).as("shard_tok"))
      .withColumn("offset",
        coalesce(sum(col("shard_tok")).over(wShard), lit(0L)))
      .select(col("lang"), col("shard"), col("offset"))
    local.join(broadcast(offsets), Seq("lang", "shard"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("bin", expr(s"(cum - n_tok) div $budget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
  }
  private val sequencePackSql =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, lang, n_tok,
       |    CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t)
       |SELECT lang, (cum - n_tok) // 2048 AS bin,
       |  COUNT(1) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Context-window chunking (q48): split every document into fixed
    * token-budget chunks with overlap — window 64 tokens, overlap 16
    * (stride 48) — the step that turns documents into model-sized training
    * sequences (RAG indexing and pretraining both run it). Pure integer
    * math: `n_chunks = 1 + ceil(max(n_tok - W, 0) / stride)`, chunk i
    * covers `[i*stride, i*stride + min(W, n_tok - i*stride))`; every chunk
    * start is in-range by construction so the tail is never empty. One
    * scan + one explode over a computed range — no shuffle at all; the
    * per-doc fan-out is n_tok/stride, linear in corpus size. */
  private[graft] def chunk(docs: DataFrame, window: Long = 64L,
      overlap: Long = 16L): DataFrame = {
    // fail fast: overlap >= window gives stride <= 0, and under non-ANSI
    // Spark the `div stride` yields null n_chunks — sequence/explode would
    // then silently DROP every document longer than `window`
    require(window > 0, s"window must be positive, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): window=$window, overlap=$overlap")
    val stride = window - overlap
    val base = docs.select(col("doc_id"),
      TextOps.tokens(col("text")).as("toks"),
      size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok"))
      .withColumn("n_chunks",
        when(col("n_tok") <= window, lit(1L))
          .otherwise(expr(s"(n_tok - $window + $stride - 1) div $stride") + 1L))
    base
      .select(col("doc_id"), col("toks"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(window), col("n_tok") - col("start_tok")).as("chunk_tok"),
        element_at(col("toks"), (col("start_tok") + 1L).cast("int"))
          .as("first_tok"))
  }
  private val chunkSql = {
    val (w, v) = (64L, 16L); val s = w - v
    s"""WITH t AS (
       |  SELECT doc_id, ${TextOps.tokensSql("text")} AS toks,
       |    CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |n AS (
       |  SELECT doc_id, toks, n_tok,
       |    CASE WHEN n_tok <= $w THEN 1
       |         ELSE (n_tok - $w + $s - 1) // $s + 1 END AS n_chunks
       |  FROM t),
       |c AS (SELECT doc_id, toks, n_tok,
       |        unnest(range(n_chunks)) AS chunk_idx FROM n)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |  CAST(chunk_idx * $s AS BIGINT) AS start_tok,
       |  CAST(least($w, n_tok - chunk_idx * $s) AS BIGINT) AS chunk_tok,
       |  toks[chunk_idx * $s + 1] AS first_tok
       |FROM c""".stripMargin
  }

  /** Training-mixture resampling (the data-mixing step: DoReMi / Pile /
    * LLaMA-style per-domain weights): each document is kept
    * `rate/1000` times in expectation — `floor(rate/1000)` full copies
    * (multi-epoch upsampling) plus one more iff the document's hash
    * falls under the fractional part. Deterministic by construction
    * (same hash family as q31/q44): reproducible across engines, runs,
    * and cluster sizes, and a document's copies are decided WITHOUT any
    * global state — pure scalar math on the scan, one explode bounded by
    * ceil(rate/1000) ≤ 3 rows per doc at these weights, no shuffle until
    * the verifying per-domain aggregate. This is the resampled-corpus
    * producer; [[domainMix]] wraps it in the oracle-facing rollup. */
  private[graft] def mixSample(docs: DataFrame,
      ratesPermille: Map[String, Int],
      defaultPermille: Int = 1000): DataFrame = {
    require(defaultPermille >= 0 && ratesPermille.values.forall(_ >= 0),
      "mix rates must be non-negative permille")
    docs
      .withColumn("rate",
        coalesce(element_at(typedLit(ratesPermille), col("source")),
          lit(defaultPermille)))
      .filter(col("rate") > 0)
      .select(col("*"),
        explode(sequence(lit(0L), expr("(rate + 999) div 1000") - 1L)).as("cp"))
      .filter((col("cp") + 1L) * 1000L <= col("rate") ||
        XHash.hash60(col("doc_id").cast("string")) % 1000 < col("rate") % 1000)
  }

  private def domainMix(s: SparkSession, d: String): DataFrame =
    mixSample(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("n_tok")),
      // src0: 2 full epochs + 30% of a third; src1: half; src2: 1.7
      // epochs; everything else: exactly one epoch
      Map("src0" -> 2300, "src1" -> 500, "src2" -> 1700))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("doc_id")).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"))
  private val domainMixSql =
    s"""WITH t AS (SELECT doc_id, source,
       |    CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tok,
       |    CASE source WHEN 'src0' THEN 2300 WHEN 'src1' THEN 500
       |      WHEN 'src2' THEN 1700 ELSE 1000 END AS rate
       |  FROM documents),
       |c AS (SELECT doc_id, source, n_tok, rate,
       |    unnest(range((rate + 999) // 1000)) AS cp FROM t)
       |SELECT source, COUNT(1) AS n_rows, COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM c
       |WHERE (cp + 1) * 1000 <= rate
       |   OR ${XHash.hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000 < rate % 1000
       |GROUP BY 1""".stripMargin

  // ---- q50: Misra–Gries heavy hitters — the frequency sketch next to
  // the cardinality (q19 HLL) and quantile (q34 t-digest) sketches.
  // Same gating pattern: the sketch's counter CONTENT is arrival-order-
  // dependent (not cross-engine hashable), but its two mathematical
  // guarantees hold for ANY order, so the output carries the exact
  // counts (hash-gated) plus the guarantee booleans the oracle pins to
  // literal TRUE:   est ≤ true ∧ true − est ≤ n/(k+1)   for every
  // token, and presence for every token above the n/(k+1) line.
  // k = 16 < |vocab| = 31 on this corpus, so eviction (reduce) and the
  // subtract-(k+1)-th merge rule both actually run — with k ≥ vocab the
  // sketch would silently be an exact count and the gate would test
  // nothing.
  private val MgK = 16
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val tot = toks.agg(count(lit(1)).as("n_total"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    val sketch = toks
      .agg(graft.functions.MisraGriesAgg.heavyHitters(MgK)(col("token")).as("mg"))
      .select(explode(col("mg.counters")).as(Seq("token", "est")))
    val est = coalesce(col("est"), lit(0L))
    exact.join(sketch, Seq("token"), "left")
      .crossJoin(broadcast(tot))
      .select(col("token"), col("n_tok"),
        (est <= col("n_tok") &&
          (col("n_tok") - est) * (MgK + 1) <= col("n_total")).as("bound_ok"),
        (col("n_tok") * (MgK + 1) <= col("n_total") || est > 0L).as("hh_ok"))
  }
  private val heavyHittersSql =
    s"""WITH tok AS (
       |  SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM documents)
       |SELECT token, COUNT(1) AS n_tok, TRUE AS bound_ok, TRUE AS hh_ok
       |FROM tok GROUP BY 1""".stripMargin

  // ---- q51: Count-Min sketch — the point-frequency sketch completing
  // the family (q19 HLL cardinality, q34 t-digest quantiles, q50 MG
  // heavy hitters, d13 Bloom membership). Unlike q50, the CM matrix is
  // an order-independent linear sketch over XHash buckets, so the
  // ESTIMATE ITSELF is hash-gated: the oracle rebuilds the identical
  // d×w matrix from exact counts (`cell(r,b) = Σ n_tok of colliding
  // tokens`) and takes the same row-wise min. w = 32 and d = 4 are
  // deliberately far below |vocab| so collisions occur and est > exact
  // for some tokens — with w ≥ vocab the sketch would silently be an
  // exact count and the gate would test nothing. Scale shape: the
  // aggregation state is a fixed d×w int64 matrix with map-side
  // combine (merge = elementwise sum), so shuffle volume is
  // partitions × 1 KiB regardless of corpus size.
  private val CmD = 4
  private val CmW = 32
  private def countMin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.CountMinAgg
    val toks = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n_tok"))
    // sketch FROM the exact counts (r16): the CM matrix is a linear
    // sketch, so vocab-sized weighted increments produce the identical
    // matrix as occurrence-sized unit increments — one token pass
    // instead of two, and CmD md5s per DISTINCT token instead of per
    // occurrence (the oracle twin always aggregated from cnt). The
    // shared token-count exchange is reused between the two legs.
    val sketch = exact
      .agg(CountMinAgg.countMinWeighted(CmD, CmW)(
        CountMinAgg.bucketsFor(CmD, CmW)(col("token")), col("n_tok")).as("cm"))
      .select(col("cm.cells").as("cells"))
    exact.crossJoin(broadcast(sketch))
      .select(col("token"), col("n_tok"),
        CountMinAgg.estimate(CmD, CmW)(col("cells"), col("token"))
          .as("cms_est"))
  }
  private val countMinSql = {
    val b = XHash.hash60Sql("(token || ':' || CAST(r.r AS VARCHAR))")
    s"""WITH tok AS (
       |  SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM documents),
       |cnt AS (SELECT token, COUNT(1) AS n_tok FROM tok GROUP BY 1),
       |buck AS (SELECT token, n_tok, r.r AS r, ($b % $CmW) AS b
       |  FROM cnt, range($CmD) r(r)),
       |cells AS (SELECT r, b, CAST(SUM(n_tok) AS BIGINT) AS cell
       |  FROM buck GROUP BY 1, 2)
       |SELECT bu.token, MIN(bu.n_tok) AS n_tok, MIN(c.cell) AS cms_est
       |FROM buck bu JOIN cells c ON c.r = bu.r AND c.b = bu.b
       |GROUP BY bu.token""".stripMargin
  }

  // ---- q53: deterministic corpus shuffle into training shards — the
  // last pipeline step before shard writes: a reproducible global
  // permutation (order by a salted 60-bit hash of the doc id) mapped to
  // (shard, position). Determinism is the point: the permutation is a
  // pure function of row VALUES, so it is identical across engines,
  // runs, and cluster sizes — resumable training, byte-stable shards.
  // The global rank goes through operators.DistributedRank (quantile
  // shards + broadcast offsets), so there is NO single-sorter global
  // window at any corpus size; the hash key is also exactly the
  // uniform-distribution axis the quantile sharding wants.
  private val ShardSize = 100L
  private def shardShuffle(s: SparkSession, d: String): DataFrame =
    assignShardsOn(Tables.documents(s, d), "doc_id", ShardSize)
  private[graft] def assignShardsOn(df: DataFrame, idCol: String,
      shardSize: Long, rowBound: Long = -1L): DataFrame = {
    require(shardSize >= 1, s"shard size must be >= 1, got $shardSize")
    val keyed = df.select(col(idCol),
      XHash.hash60(concat(lit("shuf:"), col(idCol).cast("string")))
        .as("hk"))
    graft.operators.DistributedRank.withRowNumber(
      keyed, Seq.empty, Seq(col("hk"), col(idCol)), col("hk"), "rn",
      rowBound = rowBound)
      .select(col(idCol),
        expr(s"(rn - 1) div $shardSize").as("shard"),
        expr(s"(rn - 1) % $shardSize").as("pos"))
  }
  // ---- q52: Z-order layout keys — the compactor's multi-dimensional
  // file-clustering step. The reference sorts output files on time alone
  // (kompactor.ts:107 ORDER BY time), which makes time-range pruning
  // perfect and series pruning useless: a one-series query still touches
  // every file of the window. Interleaving the bits of BOTH axes
  // (Morton/Z-order — the layout InfluxDB-class stores and lakehouse
  // OPTIMIZE commands use) gives every file a tight min/max on time AND
  // series hash, so row-group zone maps prune on either predicate.
  //
  // Raw-value interleave is skew-fragile (a hot hour or hot series
  // collapses one axis's bits to a constant prefix); the standard fix is
  // RANK equalization: each dimension is mapped to its exact global rank
  // scaled into 2^16 buckets — both axes uniform by construction — and
  // the two 16-bit bucket ids are bit-interleaved into a 32-bit zkey
  // (time on odd bits). Ranks come from operators.DistributedRank (one
  // data shuffle per axis, no single-sorter window at any size); the
  // spread/interleave itself is the classic 4-step mask-shift sequence,
  // pure per-row int64 codegen in Spark and the identical arithmetic in
  // the oracle. zshard = the top 6 zkey bits — 64 balanced grid cells
  // (each ~n/64 rows because both axes are rank-uniform), the unit a
  // compactor would write as one file. Scale: two exact-rank shuffles +
  // per-row bit math — nothing wider than the data, no skew sensitivity.
  private val ZShardBits = 6
  /** 16-bit value → its bits at even positions of a 32-bit word
    * (Morton spread): the (x | x<<s) & mask cascade for s = 8,4,2,1.
    * Shared with the compactor's opt-in z-order layout. */
  private[graft] def spread16(c0: Column): Column = {
    val steps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
      2 -> 0x33333333L, 1 -> 0x55555555L)
    steps.foldLeft(c0.bitwiseAND(lit(0xFFFFL))) { case (c, (sh, m)) =>
      c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(m))
    }
  }
  private def spread16Sql(e: String): String = {
    val steps = Seq(8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL,
      2 -> 0x33333333L, 1 -> 0x55555555L)
    steps.foldLeft(s"($e & 65535)") { case (c, (sh, m)) =>
      s"(($c | ($c << $sh)) & $m)"
    }
  }
  /** Z-order keys for a generic (id, x, y) frame: exact global rank per
    * axis → 16-bit equalized buckets → interleaved 32-bit zkey + its
    * top-[[ZShardBits]] grid shard. Output: (idCol, zkey, zshard). */
  private[graft] def zorderOn(df: DataFrame, idCol: String, xCol: String,
      yCol: String, rowBound: Long = -1L): DataFrame =
    zorderAnnotate(df.select(col(idCol), col(xCol), col(yCol)),
      idCol, xCol, yCol, rowBound)
      .select(col(idCol), col("zkey"), col("zshard"))

  /** Round-robin bit interleave of `axes`, each already reduced to
    * `bits` bits: bit i of axis j lands at position i·k + (k−1−j), so
    * axis 0 owns the most significant slot of every bit group (for
    * k = 2, bits = 16 this is exactly `spread16(x) << 1 | spread16(y)` —
    * the 2-axis fast path stays bit-identical). One codegen'd
    * shift/mask/or chain per row, k·bits terms, no shuffle. */
  private[graft] def interleaveBits(axes: Seq[Column], bits: Int): Column = {
    val k = axes.length
    require(k >= 1 && bits >= 1 && k * bits <= 63,
      s"interleaveBits: $k axes x $bits bits must fit a signed int64")
    val terms = for {
      (a, j) <- axes.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), i * k + (k - 1 - j))
    terms.reduce(_.bitwiseOR(_))
  }

  /** Per-axis bit budget for a k-axis z-key: 16 bits per axis while the
    * key fits int64 (2, 3 axes), then split 63 evenly (4 axes → 15…). */
  private[graft] def zAxisBits(k: Int): Int = math.min(16, 63 / k)

  /** [[zorderOn]] keeping EVERY input column (plus zkey/zshard) — the
    * write-path form: operators.Layout range-partitions the annotated
    * rows on zkey so each output file is one tight curve segment.
    * `rowBound > 0` must be the EXACT row count here (it becomes the
    * bucket divisor, not just a planning bound) — callers that know it
    * (Layout.writeZOrdered, ScaleFixture) save a third full pass over
    * the input on the write path (r7 advice). */
  private[graft] def zorderAnnotate(df: DataFrame, idCol: String,
      xCol: String, yCol: String, rowBound: Long = -1L): DataFrame =
    zorderAnnotateAxes(df, idCol, Seq(xCol, yCol), rowBound)

  /** N-axis generalization (r7 verdict #9 — tag-heavy InfluxDB payloads
    * often want time × 2+ tags): exact global rank per axis
    * (DistributedRank — no global single-sorter window), equalized into
    * [[zAxisBits]]-bit buckets, round-robin interleaved. Axis 0 owns the
    * top bit of each group; `zshard` is the top [[ZShardBits]] of the
    * key. The 2-axis form is bit-identical to the historical
    * spread16-based key (q52's oracle pins it). */
  private[graft] def zorderAnnotateAxes(df: DataFrame, idCol: String,
      axisCols: Seq[String], rowBound: Long = -1L): DataFrame = {
    val k = axisCols.length
    require(k >= 2, s"z-order needs >= 2 axes, got $axisCols")
    val bits = zAxisBits(k)
    val ranked = axisCols.zipWithIndex.foldLeft(df) { case (acc, (c, j)) =>
      graft.operators.DistributedRank.withRowNumber(
        acc, Seq.empty, Seq(col(c), col(idCol)), col(c), s"__rn$j",
        rowBound = rowBound)
    }
    val withN =
      if (rowBound > 0) ranked.withColumn("__n_rows", lit(rowBound))
      else ranked.crossJoin(broadcast(df.agg(count(lit(1)).as("__n_rows"))))
    val bucketed = (0 until k).foldLeft(withN) { (acc, j) =>
      acc.withColumn(s"__b$j",
        expr(s"((__rn$j - 1) * ${1L << bits}) div __n_rows"))
    }
    bucketed
      .withColumn("zkey",
        interleaveBits((0 until k).map(j => col(s"__b$j")), bits))
      .withColumn("zshard", shiftright(col("zkey"), k * bits - ZShardBits))
      .drop("__n_rows")
      .drop((0 until k).flatMap(j => Seq(s"__rn$j", s"__b$j")): _*)
  }
  private def zorderLayout(s: SparkSession, d: String): DataFrame =
    zorderOn(
      Tables.events(s, d).select(col("event_id"),
        expr("ts_ns div 1000").as("ts_us"),
        XHash.hash60(concat(lit("z:"), col("user_id").cast("string"),
          lit("/"), col("event_type"))).as("series_h")),
      "event_id", "ts_us", "series_h")
  private val zorderLayoutSql = {
    val sh = XHash.hash60Sql(
      "('z:' || CAST(user_id AS VARCHAR) || '/' || event_type)")
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, $sh AS series_h
       |  FROM events),
       |n AS (SELECT COUNT(*) AS n_rows FROM e),
       |r AS (SELECT event_id,
       |    row_number() OVER (ORDER BY ts_us, event_id) - 1 AS xr,
       |    row_number() OVER (ORDER BY series_h, event_id) - 1 AS yr
       |  FROM e),
       |b AS (SELECT event_id, (xr * 65536) // n_rows AS xb,
       |    (yr * 65536) // n_rows AS yb FROM r, n),
       |z AS (SELECT event_id,
       |    ((${spread16Sql("xb")} << 1) | ${spread16Sql("yb")}) AS zkey
       |  FROM b)
       |SELECT event_id, zkey, zkey >> ${32 - ZShardBits} AS zshard
       |FROM z""".stripMargin
  }

  // ---- q54: deterministic span corruption — the denoising-objective
  // mask a T5-style pretraining pipeline computes per document: ~5% of
  // token positions start a corruption span of 2–4 tokens, overlapping
  // spans merge, and the trainer later replaces each masked span with a
  // sentinel. Everything is a pure function of (doc_id, position) via
  // the cross-engine hash — reproducible masks across engines, runs,
  // and cluster sizes, which is what makes training resumable and
  // ablations comparable. A position p is masked iff some position
  // p−d (d ∈ 0..3) starts a span longer than d — the bounded-lookback
  // closed form of greedy span placement (max span 4), so the mask is
  // per-row array arithmetic: hash each position once, test 4
  // neighbors, no explode, no shuffle, no sequential scan. Output is
  // aggregate-gated per doc: token/masked counts + the exact
  // fingerprint of the masked-position list.
  private[graft] def spanCorruptionOn(docs: DataFrame): DataFrame = {
    val n = size(TextOps.tokens(col("text")))
    val rng = when(n >= 1, sequence(lit(1), n)).otherwise(
      lit(Array.emptyIntArray))
    // one 60-bit hash per position: h(p) = hash60(doc_id ':' p)
    val harr = transform(col("rng"), p =>
      XHash.hash60(concat(col("doc_id").cast("string"), lit(":"),
        p.cast("string"))))
    // start(h) = h % 20 == 0; len(h) = 2 + (h % 60) div 20 ∈ {2,3,4}
    // (h % 20 == 0 ⇒ h % 60 ∈ {0,20,40}). "len > d" reduces to the
    // division-free modular test h % 60 ≥ 20·(d−1) — a 60-bit div would
    // be inexact through doubles, these comparisons are exact
    def maskedAt(p: Column): Column = (0 to 3).map { d =>
      val q = p - lit(d)
      val h = element_at(col("harr"), q.cast("int"))
      val longEnough =
        if (d < 2) lit(true) else h % 60 >= lit(20L * (d - 1))
      q >= 1 && h % 20 === 0 && longEnough
    }.reduce(_ || _)
    docs.select(col("doc_id"), rng.as("rng"))
      .withColumn("harr", harr)
      .withColumn("mpos", filter(col("rng"), p => maskedAt(p)))
      .select(col("doc_id"),
        size(col("rng")).cast("bigint").as("n_tokens"),
        size(col("mpos")).cast("bigint").as("n_masked"),
        XHash.hash60(array_join(
          transform(col("mpos"), _.cast("string")), ",")).as("mask_fp"))
  }
  private val spanCorruptionSql = {
    val h = XHash.hash60Sql(
      "(CAST(doc_id AS VARCHAR) || ':' || CAST(q AS VARCHAR))")
    // harr is 1-based like the range list; DuckDB list indexing is
    // 1-based too, so the d-lookback is harr[p - d]
    val maskTerm = (0 to 3).map { d =>
      val longEnough =
        if (d < 2) "" else s" AND harr[p - $d] % 60 >= ${20 * (d - 1)}"
      s"(p - $d >= 1 AND harr[p - $d] % 20 = 0$longEnough)"
    }.mkString(" OR ")
    s"""WITH t AS (
       |  SELECT doc_id, range(1, len(${TextOps.tokensSql("text")}) + 1) AS rng
       |  FROM documents),
       |hh AS (
       |  SELECT doc_id, rng,
       |    list_transform(rng, q -> $h) AS harr
       |  FROM t),
       |m AS (
       |  SELECT doc_id, rng,
       |    list_filter(rng, p -> $maskTerm) AS mpos
       |  FROM hh)
       |SELECT doc_id, len(rng) AS n_tokens, len(mpos) AS n_masked,
       |  ${XHash.hash60Sql(
      // DuckDB array_to_string returns NULL (not '') on an empty list —
      // unmasked docs must hash the empty string like the Spark side
      "COALESCE(array_to_string(" +
        "list_transform(mpos, x -> CAST(x AS VARCHAR)), ','), '')")}
       |    AS mask_fp
       |FROM m""".stripMargin
  }

  private val shardShuffleSql =
    s"""WITH h AS (SELECT doc_id,
       |    ${XHash.hash60Sql("('shuf:' || CAST(doc_id AS VARCHAR))")} AS hk
       |  FROM documents),
       |r AS (SELECT doc_id, row_number() OVER (ORDER BY hk, doc_id) AS rn
       |  FROM h)
       |SELECT doc_id, (rn - 1) // $ShardSize AS shard,
       |  (rn - 1) % $ShardSize AS pos FROM r""".stripMargin

  /** Importance-weighted sampling (q55): per-DOCUMENT acceptance
    * probability p_i ∝ a quality weight (here the capped length — any
    * per-row score works), with the Horvitz–Thompson 1/p_i reweighted
    * population estimate alongside the raw counts. q44 samples at
    * per-STRATUM rates; this is the per-row form a mixture builder uses
    * to upweight rare-but-good documents while keeping totals unbiased.
    *
    * Cross-engine determinism: acceptance is pure integer arithmetic on
    * the shared 60-bit hash (q31/q44's family); the HT estimate sums
    * exact int64 micro-units — each sampled row contributes
    * 10¹² div (500·w) = ⌊10⁶/p_i·10⁻⁶⌋ — so the sum is
    * order-independent and ONE exact-int→double division at the end is
    * bit-identical in both engines. Scale: a scan-level filterless
    * single hash-agg (the sample decision is a projected boolean, no
    * second pass for the totals), partial-aggregated map-side. */
  private def weightedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"),
        least(greatest(col("n_chars"), lit(1L)), lit(800L)).as("w"))
      .withColumn("sampled",
        XHash.hash60(col("doc_id").cast("string")) % lit(1000000L) <
          col("w") * lit(500L))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("sampled"), lit(1L)).otherwise(lit(0L))).as("n_sampled"),
        sum(when(col("sampled"), expr("1000000000000 div (w * 500)"))
          .otherwise(lit(0L))).as("ht_e6"))
      .select(col("lang"), col("source"), col("n_total"), col("n_sampled"),
        (col("ht_e6").cast("double") / lit(1000000.0)).as("est_total_docs"))
  private val weightedSampleSql =
    s"""WITH w AS (
       |  SELECT doc_id, lang, source,
       |    LEAST(GREATEST(n_chars, 1), 800) AS w,
       |    (${XHash.hash60Sql("CAST(doc_id AS VARCHAR)")} % 1000000) <
       |      LEAST(GREATEST(n_chars, 1), 800) * 500 AS sampled
       |  FROM documents)
       |SELECT lang, source, COUNT(1) AS n_total,
       |  CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(CAST(SUM(CASE WHEN sampled
       |      THEN 1000000000000 // (w * 500) ELSE 0 END) AS BIGINT) AS DOUBLE)
       |    / 1000000.0 AS est_total_docs
       |FROM w GROUP BY 1, 2""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t6_repetition", (s, d) => repetition(Tables.documents(s, d)),
      Some(repetitionSql)),
    Q("d8_contamination", (s, d) => contamination(Tables.documents(s, d)),
      Some(contaminationSql)),
    Q("q44_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
    Q("q55_weighted_sample", weightedSample, Some(weightedSampleSql)),
    Q("q45_sequence_pack", (s, d) => sequencePack(Tables.documents(s, d)),
      Some(sequencePackSql)),
    Q("q48_chunks", (s, d) => chunk(Tables.documents(s, d)),
      Some(chunkSql)),
    Q("q49_domain_mix", domainMix, Some(domainMixSql)),
    Q("d13_bloom_decontam",
      (s, d) => bloomDecontam(Tables.documents(s, d)),
      Some(bloomDecontamSql)),
    Q("q50_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    Q("q51_countmin", countMin, Some(countMinSql)),
    Q("q52_zorder_layout", zorderLayout, Some(zorderLayoutSql)),
    Q("q53_shard_shuffle", shardShuffle, Some(shardShuffleSql)),
    Q("q54_span_corruption",
      (s, d) => spanCorruptionOn(Tables.documents(s, d)),
      Some(spanCorruptionSql)))
}
