package graft.bench

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Sessions

/** Octave-up corpus synthesizer (r2 verdict next-3): replicates the
  * pipeline-family tables (`documents`, `embeddings`, `events`) `factor`×
  * into a new SF directory, preserving WITHIN-replica structure while
  * keeping replicas independent of each other — a 10× web corpus has ~10×
  * duplicate clusters, not 10×-larger clusters, so candidate/pair counts
  * must grow near-linearly on the result (the scale gate the round-2
  * verdict asks for). The TPC-H-side tables are copied byte-for-byte.
  *
  * Independence constructions, per table (each is measurably sound — a
  * naive first cut of both text and embedding transforms failed the gate,
  * see ScaleFixtureSpec for the invariants):
  *  - documents: replica r>0 prefixes every word with `zr<r>q` — a
  *    BIJECTION on the shingle alphabet, so within-replica Jaccard (and
  *    hence minhash/LSH behavior) is preserved EXACTLY, while replicas
  *    share no word and therefore no shingle. (An earlier interleaved-
  *    token variant created `(salt, w, salt)` shingles carrying a single
  *    real word, inflating within-replica similarity 540× at 10×.)
  *  - embeddings: replica r applies a deterministic ±1 sign-flip diagonal
  *    D_r (D_0 = I). D_r is orthogonal, so within-replica dot products,
  *    norms, and cosines are preserved EXACTLY; cross-replica cosines see
  *    a random sign pattern D_r·D_s, which kills any shared mean
  *    direction (a rotation does not — structured corpora keep cosine
  *    ≈ 1 against their rotated selves far above near-dup thresholds).
  *  - events: replica r offsets user/event ids into a disjoint id space;
  *    timestamps stay — the time span holds and the per-window DENSITY
  *    grows 10×, which is the harder regime for the window operators.
  *
  * Usage: runMain graft.bench.ScaleFixture [srcDir destDir factor]
  */
object ScaleFixture {
  val IdOffset = 10000000L

  /** documents replica r: prefix each word with a replica tag (r=0 is the
    * original) — a bijection on words, so shingle sets map bijectively:
    * within-replica Jaccard exact, cross-replica shingle sets disjoint. */
  def saltDocs(df: DataFrame, r: Int): DataFrame =
    df.select(
      (col("doc_id") + lit(r * IdOffset)).as("doc_id"),
      (if (r == 0) col("text")
       else regexp_replace(col("text"), "(\\S+)", s"zr${r}q$$1")).as("text"),
      col("lang"), col("source"),
      (if (r == 0) col("n_chars")
       else length(regexp_replace(col("text"), "(\\S+)", s"zr${r}q$$1"))
         .cast("long")).as("n_chars"))

  /** Deterministic ±1 sign for component i of replica r (r=0 ⇒ +1):
    * a 64-bit mix of (r, i) — no RNG state, reproducible across runs. */
  def sign(r: Int, i: Int): Float =
    if (r == 0) 1f
    else {
      var h = r.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xC2B2AE3D27D4EB4FL
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
      if ((h & 1L) == 0L) 1f else -1f
    }

  /** embeddings replica r: multiply by the sign-flip diagonal D_r —
    * orthogonal, so within-replica geometry is exact; cross-replica
    * cosines decorrelate even for corpora with a shared mean direction. */
  def flipEmb(df: DataFrame, r: Int, dim: Int = graft.Tables.EmbeddingDim): DataFrame = {
    val signs = array((0 until dim).map(i => lit(sign(r, i))): _*)
    df.select(
      (col("vec_id") + lit(r * IdOffset)).as("vec_id"),
      (if (r == 0) col("embedding")
       else zip_with(col("embedding"), signs, (a, s) => a * s)).as("embedding"),
      col("label"))
  }

  /** events replica r: disjoint id space, same time span (10× density —
    * the harder regime for the window operators). */
  def offsetEvents(df: DataFrame, r: Int): DataFrame =
    df.select(
      (col("event_id") + lit(r * IdOffset)).as("event_id"),
      col("ts"),
      (col("user_id") + lit(r * IdOffset)).as("user_id"),
      col("event_type"), col("value"), col("props"))

  /** Relational replicas (r4 verdict #2 — the relational family had no
    * measured-scale evidence past sf0.1): orderkey/custkey shift TOGETHER
    * into a disjoint key space, so within-replica join structure
    * (customer↔orders↔lineitem multiplicities, dates, prices, segments)
    * is preserved EXACTLY and cross-replica keys never join. part/supp/
    * nation/region stay 1× — their fan-out grows 10×, which is the harder
    * (and realistic: dimensions grow slower than facts) regime for the
    * dimension joins. */
  def shiftCustomer(df: DataFrame, r: Int): DataFrame =
    df.select((col("c_custkey") + lit(r * IdOffset)).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))

  def shiftOrders(df: DataFrame, r: Int): DataFrame =
    df.select((col("o_orderkey") + lit(r * IdOffset)).as("o_orderkey"),
      (col("o_custkey") + lit(r * IdOffset)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))

  def shiftLineitem(df: DataFrame, r: Int, shiftDims: Boolean = false): DataFrame = {
    val dimShift = if (shiftDims) r * IdOffset else 0L
    df.select((col("l_orderkey") + lit(r * IdOffset)).as("l_orderkey"),
      (col("l_partkey") + lit(dimShift)).as("l_partkey"),
      (col("l_suppkey") + lit(dimShift)).as("l_suppkey"), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
  }

  /** part/supplier replica r for the dims-scaled octave (r5 verdict
    * missing #5: every octave kept dims 1×, so broadcast-dim plans had no
    * measured point where the dim side outgrows the broadcast threshold).
    * Keys shift into the SAME disjoint spaces as the lineitem replicas'
    * l_partkey/l_suppkey, so each dim key keeps its exact original
    * multiplicity — dims grow WITH facts instead of fanning out. */
  def shiftPart(df: DataFrame, r: Int): DataFrame =
    df.select((col("p_partkey") + lit(r * IdOffset)).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice"))

  def shiftSupplier(df: DataFrame, r: Int): DataFrame =
    df.select((col("s_suppkey") + lit(r * IdOffset)).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal"))

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dest = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // 4th arg "dims": also replicate part/supplier factor× with keys
    // shifted ALONGSIDE the lineitem replicas — the dims-scaled octave
    val scaleDims = args.lift(3).contains("dims")
    // SPARK_GRAFT_FIXTURE_TABLES=events,documents — replicate only the
    // named tables (single-family deep octaves: a 1000× events fixture
    // should not pay for 600M lineitem rows it will never scan)
    val tablesFilter = sys.env.get("SPARK_GRAFT_FIXTURE_TABLES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def want(t: String): Boolean = tablesFilter.forall(_.contains(t))
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dest))

    // by default dimensions stay 1× (fan-out grows with the facts); the
    // customer→orders→lineitem spine replicates with shifted keys
    val copied = if (scaleDims) Seq("region", "nation")
                 else Seq("region", "nation", "supplier", "part")
    copied.filter(t => want(t) || tablesFilter.isEmpty).foreach { t =>
      val srcPath = Paths.get(s"$src/$t.parquet")
      if (Files.isDirectory(srcPath)) { // a prior fixture's multi-part dir
        spark.read.parquet(srcPath.toString)
          .write.mode("overwrite").parquet(s"$dest/$t.parquet")
      } else
        Files.copy(srcPath, Paths.get(s"$dest/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
    }

    def replicate(name: String, perReplica: (DataFrame, Int) => DataFrame): Unit =
      if (want(name)) {
        val base = spark.read.parquet(s"$src/$name.parquet")
        val out = (0 until factor).map(r => perReplica(base, r))
          .reduce(_ unionAll _)
        out.write.mode("overwrite").parquet(s"$dest/$name.parquet")
        System.err.println(s"[scale-fixture] $name x$factor -> $dest")
      }

    replicate("customer", shiftCustomer)
    replicate("orders", shiftOrders)
    replicate("lineitem", shiftLineitem(_, _, shiftDims = scaleDims))
    if (scaleDims) {
      replicate("part", shiftPart)
      replicate("supplier", shiftSupplier)
    }
    replicate("documents", saltDocs)
    replicate("embeddings", flipEmb(_, _))
    // events.ts passes through in whatever encoding the corpus carries
    // (int64 ns or timestamp[us]); Tables.events adapts either to the
    // int64 ts_ns contract, so the engine-side queries see one schema
    replicate("events", offsetEvents)

    spark.stop()
  }
}

/** Logs the dedup-family candidate/pair counts at an SF dir — the scale
  * gate's evidence line: counts must grow ~linearly between octaves.
  *
  * d5 is reported in BOTH regimes because they scale differently by
  * design: the production regime (8 bands × 16 bits, threshold 0.9) is
  * the one that must stay linear; the wide demo regime (32 × 4, threshold
  * 0.45) trades pruning for recall at a low threshold — a 4-bit band
  * matches a random pair with p = 1/16, so with 32 bands nearly every
  * pair is a candidate and the candidate set is inherently ~quadratic.
  * That regime exists for the small-corpus oracle demo, not for scale.
  *
  * Usage: runMain graft.bench.ScaleReport [sfDir]
  */
object ScaleReport {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    val dim = graft.Tables.EmbeddingDim
    val nDocs = docs.count()
    val nEmb = emb.count()
    val d2 = graft.queries.DedupQueries.minhashLsh(docs).count()
    spark.catalog.clearCache()
    // pairs pinned once: d3's count is also p1's input, and p1's wall
    // must measure the 5 power-iteration rounds, not a pair-gen replay
    val pairsP = graft.queries.DedupQueries.jaccardPairs(docs)
      .select(col("doc_a"), col("doc_b")).persist()
    val d3 = pairsP.count()
    // p1 PageRank octave evidence (round 7): the graph is the d3 pair
    // set (growth measured linear above); wall covers 5 rounds = one
    // ranks-join + one dst-aggregate shuffle each over |E| edges
    val tPr = System.nanoTime()
    val prRanks = graft.operators.PageRank.pageRank(pairsP, 5)
    val p1Nodes = prRanks.count()
    val p1Sec = (System.nanoTime() - tPr) / 1e9
    prRanks.unpersist()
    // p2 triangle enumeration over the same pinned pair set: wall covers
    // the two oriented equi-joins + per-node rollup; the count is the
    // linearity evidence (independent replicas add triangles, never
    // cross-replica ones)
    val tTri = System.nanoTime()
    val p2Rows = graft.queries.DedupQueries.triangleCounts(pairsP)
    val p2Nodes = p2Rows.count()
    val p2Sec = (System.nanoTime() - tTri) / 1e9
    // p3 label propagation over the same pinned pair set: wall covers
    // 3 synchronous rounds (one labels-join + two hash-aggs each over
    // the symmetrized |E|); community count is the structure evidence —
    // independent replicas can only add communities, never merge them
    val tLp = System.nanoTime()
    val lpOut = graft.operators.LabelProp.propagate(pairsP, 3)
    val p3Nodes = lpOut.count()
    val p3Comms = lpOut.select(col("community")).distinct().count()
    val p3Sec = (System.nanoTime() - tLp) / 1e9
    lpOut.unpersist()
    pairsP.unpersist()
    spark.catalog.clearCache()
    val d5prodCand = graft.queries.DedupQueries
      .embNearDupBanded(emb, 8, 16, threshold = -1.0, dim = dim).count()
    spark.catalog.clearCache()
    // bits-per-band sweep: chance candidates scale as n^2 * bands * 2^-bits,
    // so holding bits fixed across octaves is quadratic BY CONSTRUCTION and
    // the scale rule is bits ~ log2(n) — these two extra points pin the law
    val d5cand20 = graft.queries.DedupQueries
      .embNearDupBanded(emb, 8, 20, threshold = -1.0, dim = dim).count()
    spark.catalog.clearCache()
    val d5cand24 = graft.queries.DedupQueries
      .embNearDupBanded(emb, 8, 24, threshold = -1.0, dim = dim).count()
    spark.catalog.clearCache()
    val d5prod = graft.queries.DedupQueries
      .embNearDupBanded(emb, 8, 16, threshold = 0.9, dim = dim).count()
    spark.catalog.clearCache()
    // auto-tuned regime: bits/bands derived from n alone — the row whose
    // per-vector load must stay ~flat across octaves
    val (autoBands, autoBits) =
      graft.queries.DedupQueries.autoBandParams(nEmb, threshold = 0.9)
    val d5autoCand = graft.queries.DedupQueries
      .embNearDupBanded(emb, autoBands, autoBits, threshold = -1.0, dim = dim)
      .count()
    spark.catalog.clearCache()
    // the wide demo regime (32 bands x 4 bits @ 0.45) keeps ~every pair as
    // a candidate — quadratic BY CONSTRUCTION (documented above); at 100x
    // that is ~2e10 pairs, so it is only measured where it is feasible
    val d5demo = if (nEmb <= 30000)
      graft.queries.DedupQueries
        .embNearDupBanded(emb, 32, 4, threshold = 0.45, dim = dim).count()
    else -1L
    // s3 cell-population skew: hash-sampled centroids should yield
    // balanced cells; max/median population is the load-balance evidence
    // (one straggler cell = one straggler task at scale)
    val cellStats = graft.queries.SimilarityQueries.ivfAssign(emb, nHint = nEmb)
      .groupBy(col("cell")).agg(count(lit(1)).as("pop"))
      .agg(count(lit(1)).as("n_cells"), max(col("pop")).as("max_pop"),
        expr("CAST(percentile_approx(pop, 0.5) AS BIGINT)").as("med_pop"))
      .head()
    spark.catalog.clearCache()
    val (s3Cells, s3MaxPop, s3MedPop) =
      (cellStats.getLong(0), cellStats.getLong(1), cellStats.getLong(2))
    // d11 prefix-filter diagnostics: candidate volume (pre-verify) vs
    // verified pairs — the posting-list pass whose growth explains the
    // operator's wall time at each octave
    val d11Cand = graft.queries.DedupQueries
      .containmentCandidates(docs, theta = 0.6)._1.count()
    spark.catalog.clearCache()
    val d11Pairs = graft.queries.DedupQueries
      .containmentJoin(docs, theta = 0.6).count()
    spark.catalog.clearCache()
    // s4/d14 octave evidence (r6 verdict #4): at scale the caller sizes
    // k ~ sqrt(n), so within-cell pair volume is ~ n²/(2k) = n^1.5/2 —
    // SemDeDup's bucketing claim (n^1.5-class like s3, NOT quadratic).
    // Measured per octave: one timed assign pass, one timed Lloyd update
    // pass (each materialized via count), and the exact candidate-pair
    // count Σ m(m−1)/2 over the final cells plus the cell-skew stats
    // (one monster cell = one quadratic straggler task at 100 TB).
    val kScale = math.max(4, math.ceil(math.sqrt(nEmb.toDouble)).toInt)
    val prep = graft.operators.KMeans.prepare(emb).persist()
    prep.count()
    val cent0 = graft.operators.KMeans.init(prep, kScale, nHint = nEmb)
      .persist()
    cent0.count()
    val tA = System.nanoTime()
    val asg0 = graft.operators.KMeans.assign(prep, cent0).persist()
    asg0.count()
    val s4AssignSec = (System.nanoTime() - tA) / 1e9
    val tU = System.nanoTime()
    val cent1 = graft.operators.KMeans.update(asg0).persist()
    cent1.count()
    val s4UpdateSec = (System.nanoTime() - tU) / 1e9
    val d14Stats = graft.operators.KMeans.assign(prep, cent1)
      .groupBy(col("cell")).agg(count(lit(1)).as("m"))
      .agg(count(lit(1)).as("n_cells"), max(col("m")).as("max_pop"),
        expr("CAST(percentile_approx(m, 0.5) AS BIGINT)").as("med_pop"),
        sum(expr("m * (m - 1) div 2")).as("cand_pairs"))
      .head()
    Seq(prep, cent0, asg0, cent1).foreach(_.unpersist())
    spark.catalog.clearCache()
    // s5 PQ octave evidence (round 7): fit is the n·m·k assign pass —
    // linear in n at FIXED (m, k) (the codebook resolution is a
    // constant at scale, unlike s3's √n cells); codes volume is exactly
    // n·m; the ADC scan is queries × n candidate sums over the codes
    // plus an R-row rerank against full vectors
    val tPqFit = System.nanoTime()
    val pqPrep = graft.operators.ProductQuantizer.prepare(emb, dim, 8)
    val (pqCodesRaw, pqCbRaw) =
      graft.operators.ProductQuantizer.fit(pqPrep, 64, 1, nEmb)
    val pqCodes = pqCodesRaw.persist()
    val pqCb = pqCbRaw.persist()
    val pqCodesN = pqCodes.count()
    pqCb.count()
    val pqFitSec = (System.nanoTime() - tPqFit) / 1e9
    val tPqScan = System.nanoTime()
    val pqQueries = pqPrep.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("sub"), col("qs").as("qqs"))
    val pqCand = graft.operators.ProductQuantizer
      .adcTopK(pqCodes, pqCb, pqQueries, 20)
    val pqVecs = emb.select(col("vec_id"),
      graft.operators.TextOps.quantize(col("embedding")).as("q"))
    val pqQf = pqVecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val pqTopN = graft.operators.ProductQuantizer
      .rerank(pqCand, pqVecs, pqQf, 3).count()
    val pqScanSec = (System.nanoTime() - tPqScan) / 1e9
    Seq(pqCodes, pqCb).foreach(_.unpersist())
    spark.catalog.clearCache()
    // d17 line dedup: linear counters (lines in / kept) under the gate
    // query's deterministic boilerplate injection
    val d17Aug = docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit("\nboilerplate-"), (col("doc_id") % 5).cast("string")))
        .otherwise(lit("")),
      when(col("doc_id") % 4 === 0,
        concat(lit("\nfooter-"), (col("doc_id") % 3).cast("string")))
        .otherwise(lit(""))))
    val d17Row = graft.queries.DedupQueries.lineDedupOn(d17Aug)
      .agg(sum(col("n_lines")).as("l"), sum(col("n_kept")).as("k")).head()
    val (d17Lines, d17Kept) = (d17Row.getLong(0), d17Row.getLong(1))
    spark.catalog.clearCache()
    // t12 n-gram LM: wall covers bigram extraction + both count tables +
    // the scoring join; the model row count is the vocab-growth evidence
    // (replicas share no word, so bigram vocab grows exactly linearly
    // while per-doc score distributions stay identical within replicas)
    val tLm = System.nanoTime()
    val lmScored = graft.queries.TextQueries.ngramLmOn(docs)
      .agg(count(lit(1)).as("docs"), sum(col("n_bigrams")).as("occ")).head()
    val t12Sec = (System.nanoTime() - tLm) / 1e9
    val (t12Docs, t12Occ) = (lmScored.getLong(0), lmScored.getLong(1))
    spark.catalog.clearCache()
    // d18 URL dedup: canonical group count (exactly nDocs/4 under the
    // gate injection — linear by construction, the evidence is the wall
    // of the regex chain + single hash groupBy)
    val tUrl = System.nanoTime()
    val d18Groups = graft.queries.DedupQueries.urlDedupOn(docs).count()
    val d18Sec = (System.nanoTime() - tUrl) / 1e9
    spark.catalog.clearCache()
    // ts8 CUSUM: per-key change points over events (present only in
    // fixtures that replicate the events family); wall covers the two
    // running-frame passes + the rank pass — one shuffle by key
    val (ts8Keys, ts8Sec) =
      if (Files.exists(Paths.get(s"$dir/events.parquet"))) {
        val ev = graft.Tables.events(spark, dir)
          .select(col("user_id"), col("event_id"),
            expr("ts_ns div 1000").as("ts_us"),
            round(col("value") * 100).cast("bigint").as("c"))
        val tCp = System.nanoTime()
        val k = graft.queries.TimeSeriesQueries
          .changePointsOn(ev, "user_id", "event_id", "ts_us", "c").count()
        (k, (System.nanoTime() - tCp) / 1e9)
      } else (-1L, -1.0)
    spark.catalog.clearCache()
    // t16 NFC normalization: zero-shuffle scalar class (t7/d18 cousins);
    // wall of the scan + normalize + hash, changed count = the injected
    // 3-in-4 composition rate (exactly linear by construction)
    val tNfc = System.nanoTime()
    // the fp sum forces the hash column — a bare count would let
    // Catalyst prune the normalize+hash work out of the measurement
    val nfcRow = graft.queries.TextQueries.nfcNormalizeOn(docs)
      .agg(count(lit(1)).as("n"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("ch"),
        sum(col("fp") % 1000L).as("force")).head()
    val t16Sec = (System.nanoTime() - tNfc) / 1e9
    val (t16Rows, t16Changed) = (nfcRow.getLong(0), nfcRow.getLong(1))
    spark.catalog.clearCache()
    // t17 script profile: the second zero-shuffle scalar-regex pass
    // (t16's cousin); the script histogram forces every count column
    val tScr = System.nanoTime()
    val scrRow = graft.queries.TextQueries.scriptProfileOn(docs)
      .agg(count(lit(1)).as("n"), sum(col("n_cyrillic")).as("cy"),
        sum(col("n_cjk") + col("n_greek") + col("n_devanagari")).as("oth"))
      .head()
    val t17Sec = (System.nanoTime() - tScr) / 1e9
    val t17Rows = scrRow.getLong(0)
    spark.catalog.clearCache()
    // s7 MIPS: s1's broadcast-query cost class on raw int64 dots; the
    // rank sum forces the scoring pass
    val tMips = System.nanoTime()
    val s7Rows = graft.queries.SimilarityQueries.mipsTopK(emb)
      .agg(count(lit(1)).as("n"), sum(col("dot") % 97L).as("force")).head()
      .getLong(0)
    val s7Sec = (System.nanoTime() - tMips) / 1e9
    spark.catalog.clearCache()
    // q52 z-order + ts10 rolling median + ts12 holt over events
    // (events-family fixtures only). q52's wall covers the two
    // exact-rank passes + the per-row interleave; shard max/median
    // population is the balance evidence (rank equalization must hold
    // under the replicas' time offsets). ts10/ts12 are ts4's cost
    // class: one shuffle by key, one bounded frame — wall + row count.
    val (q52Rows, q52MaxPop, q52MedPop, q52Sec, ts10Rows, ts10Sec,
        ts12Sec) =
      if (Files.exists(Paths.get(s"$dir/events.parquet"))) {
        val evBase = graft.Tables.events(spark, dir)
        val nEv = evBase.count()
        val zin = evBase.select(col("event_id"),
          expr("ts_ns div 1000").as("ts_us"),
          graft.functions.XHash.hash60(concat(lit("z:"),
            col("user_id").cast("string"), lit("/"), col("event_type")))
            .as("series_h"))
        val tZ = System.nanoTime()
        val zstats = graft.queries.PipelineQueries
          .zorderOn(zin, "event_id", "ts_us", "series_h", rowBound = nEv)
          .groupBy(col("zshard")).agg(count(lit(1)).as("pop"))
          .agg(sum(col("pop")).as("n"), max(col("pop")).as("maxp"),
            expr("CAST(percentile_approx(pop, 0.5) AS BIGINT)").as("medp"))
          .head()
        val zSec = (System.nanoTime() - tZ) / 1e9
        spark.catalog.clearCache()
        val med = evBase.select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("ts_us"),
          round(col("value") * 100).cast("bigint").as("c"))
        val tM = System.nanoTime()
        // sum the median column — a bare count would let Catalyst prune
        // the whole window frame out of the measurement
        val mRow = graft.queries.TimeSeriesQueries
          .rollingMedianOn(med, "user_id", "event_id", "ts_us", "c")
          .agg(count(lit(1)).as("n"), sum(col("med_c")).as("force")).head()
        val mRows = mRow.getLong(0)
        val mSec = (System.nanoTime() - tM) / 1e9
        spark.catalog.clearCache()
        val wH = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        val holtLv = (0 until 8).map(j =>
          if (j == 0) col("c") else lag(col("c"), j).over(wH))
        val holtNum = graft.queries.TimeSeriesQueries.HoltWeights
          .zip(holtLv).map { case (wi, l) => l * wi }.reduce(_ + _)
        val tH = System.nanoTime()
        med.select(col("user_id"),
          when(holtLv(7).isNotNull, holtNum).otherwise(lit(0L)).as("f"))
          .agg(count(lit(1)), sum(col("f") % 97L)).head()
        val hSec = (System.nanoTime() - tH) / 1e9
        (zstats.getLong(0), zstats.getLong(1), zstats.getLong(2), zSec,
          mRows, mSec, hSec)
      } else (-1L, -1L, -1L, -1.0, -1L, -1.0, -1.0)
    spark.catalog.clearCache()
    val json =
      s"""{"dir":"$dir","documents":$nDocs,"embeddings":$nEmb,""" +
        s""""d11_candidates":$d11Cand,"d11_pairs":$d11Pairs,""" +
        s""""d2_candidates":$d2,"d3_pairs":$d3,""" +
        s""""d5_prod_candidates":$d5prodCand,""" +
        s""""d5_cand_20bit":$d5cand20,"d5_cand_24bit":$d5cand24,""" +
        s""""d5_prod_pairs":$d5prod,""" +
        s""""d5_auto_bands":$autoBands,"d5_auto_bits":$autoBits,""" +
        s""""d5_auto_candidates":$d5autoCand,"d5_demo_pairs":$d5demo,""" +
        s""""s3_cells":$s3Cells,"s3_cell_max":$s3MaxPop,"s3_cell_median":$s3MedPop,""" +
        s""""s4_k":$kScale,"s4_assign_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, s4AssignSec)},""" +
        s""""s4_update_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, s4UpdateSec)},""" +
        s""""d14_cells":${d14Stats.getLong(0)},"d14_cell_max":${d14Stats.getLong(1)},""" +
        s""""d14_cell_median":${d14Stats.getLong(2)},"d14_candidate_pairs":${d14Stats.getLong(3)},""" +
        s""""p1_nodes":$p1Nodes,"p1_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, p1Sec)},""" +
        s""""s5_codes":$pqCodesN,"s5_top":$pqTopN,""" +
        s""""s5_fit_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, pqFitSec)},""" +
        s""""s5_scan_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, pqScanSec)},""" +
        s""""d17_lines":$d17Lines,"d17_kept":$d17Kept,""" +
        s""""p2_nodes":$p2Nodes,"p2_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, p2Sec)},""" +
        s""""t12_docs":$t12Docs,"t12_occ":$t12Occ,""" +
        s""""t12_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, t12Sec)},""" +
        s""""d18_groups":$d18Groups,"d18_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, d18Sec)},""" +
        s""""ts8_keys":$ts8Keys,"ts8_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, ts8Sec)},""" +
        s""""p3_nodes":$p3Nodes,"p3_communities":$p3Comms,""" +
        s""""p3_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, p3Sec)},""" +
        s""""t16_rows":$t16Rows,"t16_changed":$t16Changed,""" +
        s""""t16_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, t16Sec)},""" +
        s""""q52_rows":$q52Rows,"q52_shard_max":$q52MaxPop,"q52_shard_median":$q52MedPop,""" +
        s""""q52_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, q52Sec)},""" +
        s""""ts10_rows":$ts10Rows,"ts10_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, ts10Sec)},""" +
        s""""ts12_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, ts12Sec)},""" +
        s""""t17_rows":$t17Rows,"t17_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, t17Sec)},""" +
        s""""s7_rows":$s7Rows,"s7_sec":${"%.3f".formatLocal(java.util.Locale.ROOT, s7Sec)}}"""
    spark.stop()
    println(json)
  }
}
