package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up smoke: proves the registry's most expensive queries scale
  * ~linearly in rows with UNCHANGED plan shape — the local stand-in for
  * "would this still work at 100 TB" that sf0.01/sf0.1 correctness runs
  * can't answer.
  *
  * Deterministic generators (hash-based, no RNG state) synthesize
  * `documents`, `events` and `embeddings` at a base scale matching
  * sf0.1 (5k docs / 100k events / 2k dim-64 vectors) and at `factor`×
  * that — embeddings additionally at dim ×8 (512) for the dim-scaled
  * vector family — into temp dirs shaped like the driver's sf dirs. The heaviest registry queries that
  * read only those two tables then run at both scales; for each we
  * compare wall time (expect ≤ ~linear growth; sorts are n·log n and
  * candidate joins grow with duplicate structure, so the gate is
  * time_ratio ≤ 3× the row ratio — a straggler stage or an accidental
  * all-pairs blows far past that) and the FINAL adaptive plan's shape.
  * The plan gate is structural-pathology only: a nested-loop or
  * cartesian join APPEARING at scale fails, as does shuffle-stage
  * growth; a broadcast→sort-merge strategy change is REPORTED but not
  * failed — when both join sides scale together that flip is AQE
  * doing its job, and the real 100 TB deployments keep their small
  * sides small (a dim table, a benchmark set, a daily increment).
  *
  * Usage: runMain graft.BenchScale [factor]   (default 10)
  * Prints one JSON line per query and a summary; exits nonzero on a
  * plan-shape change or a super-linear blowup.
  */
object BenchScale {
  // the bench-r3 top queries that read only documents/events: corpus
  // pipeline + dedup families (documents) and bar/session/json families
  // (events)
  private val QueryNames = Seq(
    "q_corpus_build", "q_minhash_incremental", "q_minhash_dedup",
    "q_ngram_guarded", "q_ngram_jaccard", "q_simhash_pairs",
    "q_json_extract", "q_repetition", "q_ohlcv_bars", "q_vwap",
    "q_sessionize", "q_dedup_components", "q_doc_chunk", "q_keyterms",
    // round-5 additions: text mining + CDC over documents, analytics
    // over events
    "q_bm25", "q_vocab_encode", "q_boilerplate", "q_cdc_chunk",
    "q_funnel", "q_retention", "q_gapfill", "q_pivot",
    // round-5 wave 2: line dedup + layout planning over documents,
    // window analytics + sweep line over events, bloom join over the
    // synthetic orders/customer pair. q_editdist_pairs is EXCLUDED by
    // design: its prefix blocks are keyed on the first ~2 words, and
    // this generator's 1600-word effective vocabulary makes block
    // populations grow ∝ corpus size (candidate pairs ∝ n²) — a
    // generator artifact like the shingle-collision note below, not an
    // engine property; real corpora keep prefix blocks bounded.
    "q_line_dedup", "q_compaction_plan", "q_skew_diag",
    "q_rolling_corr", "q_corr_matrix", "q_concurrency", "q_bloom_join",
    // round-5 wave 3: IR + sequence mining + graph + profiling —
    // q_pagerank's rounds are FIXED (3), so its cost is 3 edge
    // shuffles growing ×factor; q_profile is one Expand-widened scan
    "q_transitions", "q_inverted_index", "q_pagerank", "q_profile",
    // round-5 wave 4: twap + sketch. q_triangles is EXCLUDED by
    // design: a co-occurrence projection of THIS uniform generator
    // densifies toward the complete graph (every supplier meets every
    // other through some part), so wedge work grows ~quadratically —
    // a generator artifact like the editdist/shingle notes above;
    // real co-supply graphs are sparse with power-law tails, which is
    // the regime the degree orientation is built for.
    "q_twap", "q_hll_distinct", "q_scd2", "q_countmin",
    "q_partial_merge", "q_setsim_join", "q_interval_join",
    // round-5 wave 5: incremental join maintenance (synthetic
    // orders/lineitem), multi-level exact distinct, bounded running
    // total, audience overlap, rolling integer variance, robust stats
    "q_delta_join", "q_distinct_rollup", "q_cume_distinct",
    "q_segment_overlap", "q_bollinger", "q_mad",
    // round-5 wave 6: KMV sketch, robust outliers, sequence islands,
    // bounded listagg, unpivot
    "q_kmv_distinct", "q_anomaly_mad", "q_gaps_islands",
    "q_group_concat", "q_unpivot",
    // round-5 wave 7: contribution shares, snapshot reconciliation,
    // weighted median
    "q_share", "q_snapshot_diff", "q_weighted_median",
    // round-5 wave 8: LOCF fill, DQ audit, zone maps, WoW growth,
    // sketch-pruned heavy hitters
    "q_locf", "q_dq_audit", "q_zonemap_prune", "q_wow_growth",
    "q_heavy_hitters", "q_hist_quantile",
    // round-6: span-level substring dedup (window hashes — md5 space,
    // df stays tiny so the mark-back join is linear), scan-local
    // classifier scoring (zero shuffles by construction), TF-cosine
    // over 5-gram shingles (candidate volume Σdf² — linear while the
    // shingle space outgrows the corpus, same regime as setsim)
    "q_substring_dedup", "q_classifier_score", "q_tf_cosine",
    // bounded-buffer grouped top-k over synthetic orders: linear by
    // construction (map-side discard), the plan gate would catch a
    // regression back to a Window sort
    "q_grouped_topk",
    // round-6 wave 2: sequence pattern / bitmap masks / grouping sets
    // / nearest as-of over events (one or two exchanges over the fact
    // table each), PMI collocations over documents (vocab bounded at
    // 40, pair fan-out ≤ vocab²/2 per doc). q_semdedup and q_knn_graph
    // are EXCLUDED by design: their blocking cells (4096 sign buckets
    // / 10 labels) are FIXED while generator rows grow, so within-cell
    // candidate pairs grow ∝ n² — a generator artifact (real
    // deployments grow the cell count with the corpus: k-means k ∝ n,
    // labels from a bounded-size clusterer), same family as the
    // editdist/triangles notes above.
    "q_pattern_match", "q_bitmap_index", "q_grouping_sets",
    "q_asof_nearest", "q_pmi_cooccur",
    // exact interpolated percentiles over events (partitioned rank
    // window), RFM quartile segmentation over synthetic orders/customer
    "q_percentile_cont", "q_rfm",
    // integer-CUSUM changepoint + point-in-time feature join + funnel
    // latency histogram, all over events (partitioned windows / asof
    // merges — linear).
    "q_changepoint", "q_feature_join", "q_funnel_time",
    // round-6 wave 3: keyness/diversity over documents (two-level
    // aggregations), chi-square + effective-area downsampling over
    // events (partitioned windows), minhash calibration (same
    // inverted-index pair join as q_ngram_jaccard plus 16 hex52 min
    // aggregates). q_kcore is EXCLUDED by design: this generator's
    // co-purchase graph densifies with scale (every customer meets
    // every supplier — the q_triangles note), so shell sizes are a
    // generator artifact; real purchase graphs stay sparse.
    "q_keyness", "q_diversity", "q_chi2", "q_downsample_lttb",
    "q_minhash_calibration",
    // round-6 wave 4: feature hashing + novelty over documents, path
    // trigrams over events, basket rules over synthetic
    // orders/lineitem (pair fan-out bounded by basket size)
    "q_hashing_trick", "q_ngram_novelty", "q_path_mining",
    "q_market_basket",
    // round-6 wave 5: argmax/mode/OLS over events (one or two
    // exchanges each), length-band curation over documents
    // (partitioned rank window), recursive org-chain over synthetic
    // customers (log₂ n broadcast-scale rounds — expect ~log-linear,
    // well inside the 3× gate).
    "q_argmax", "q_mode", "q_regr_fit", "q_length_band", "q_org_chain",
    // round-6 wave 6: corpus dup-rate (global hash count + rollup),
    // DAU/WAU (distinct day×user then a ≤7-day band join), gap
    // medians + attribution (partitioned windows over events)
    "q_dup_rate_by_source", "q_dau_wau", "q_interarrival",
    "q_attribution",
    // round-6 wave 7: Benford digits over synthetic orders, Tukey-
    // fence outliers + hourly seasonality over events — each a rollup
    // or partitioned window.
    "q_benford", "q_iqr_outliers", "q_hourly_profile",
    // round-6 wave 8: stream-disorder audit over events (one
    // partitioned running-max window), LSH band health over documents
    // (the minhash signature aggregation + two rollups).
    "q_late_arrivals", "q_lsh_band_stats",
    // round-6 wave 9: bipartite degree profile over synthetic
    // orders/lineitem/customer (distinct + two rollups + a rank
    // window), per-language complexity sums over documents.
    // q_mutual_nn stays EXCLUDED like q_knn_graph/q_semdedup: the 10
    // fixed label cells make within-cell pairs ∝ n² on this
    // generator (real corpora grow the cell count with the data).
    "q_degree_stats", "q_text_complexity",
    // round-6 wave 10: lag-1 autocorrelation over events (one
    // partitioned lag window + a six-sum rollup)
    "q_autocorr",
    // round-6 wave 11: balanced per-class sampling over documents
    // (one rank window on a portable hash)
    "q_balanced_sample",
    // round-6 wave 12: Q22 inactivity cohort over synthetic
    // orders/customer (scalar broadcast + anti join), similar-docs
    // top-3 over documents (same candidate regime as q_ngram_jaccard)
    "q_tpch_q22", "q_similar_docs",
    // round-6 wave 13: Q13 custdist over synthetic customer/orders
    // (left join + double aggregate)
    "q_tpch_q13",
    // round-6 wave 14: Q17's division-free correlated-average test
    // over synthetic lineitem (two passes of the fact table, one join)
    "q_tpch_q17",
    // round-6 wave 15 (session 4): DSIR importance scoring + epoch
    // mixing over documents — a token stream against a 4096-row
    // broadcast weight table, and a scan-local sequence+explode with
    // one TakeOrdered; both linear by construction
    "q_dsir_select", "q_epoch_mix",
    // ── round 7: the generator now synthesizes part/supplier and the
    // fixed nation/region enums, carries o_orderstatus/c_mktsegment,
    // spreads o_orderdate over the sf span (1995 + 2400 days), and
    // derives l_shipdate from the order's own date — so the WHOLE
    // TPC-H suite runs in the smoke (each shape is 1-3 fact-table
    // exchanges + broadcast dims), q1_agg included. Round 8: q_tpch_q11
    // re-admitted — the generator's l_extendedprice now carries a
    // log-uniform per-PART multiplier (see makeLineitem), restoring
    // the power-law per-part value spread whose absence made the
    // above-average cutoff go 0-row (CLT tightening on uniform
    // hashes — a generator artifact, not an engine property). ──
    "q1_agg", "q_tpch_q2", "q_tpch_q3", "q_tpch_q4", "q_tpch_q5",
    "q_tpch_q6", "q_tpch_q7", "q_tpch_q8", "q_tpch_q9", "q_tpch_q10",
    "q_tpch_q11", "q_late_shipments", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q16", "q_tpch_q18", "q_tpch_q19", "q_tpch_q20", "q_tpch_q21",
    // round-7 wave 2: the part/segment-reading registry queries the
    // missing columns excluded until now — Pareto segmentation + the
    // 2D skyline (one rank window / one running-max pass over part),
    // full referential-integrity audit (anti joins against every dim),
    // shuffle-free bucketed join (the bucket BUILD is memoized per
    // dir; the timed probe is the shuffle-less sort-merge join),
    // capped common-neighbor link prediction (part-side + middle-side
    // d≤128 caps bound the wedge volume; the 2% order sample keeps
    // the co-supply projection sparse now that the part space scales
    // with the fact table)
    "q_pareto", "q_skyline", "q_ref_integrity", "q_bucket_join",
    "q_link_predict",
    // ── round 8: the BENCH_FULL_r8 audit of the exclusion ledger found
    // these carrying the "sub-second" default reason at 1.2-2.2 s —
    // admit them instead of re-labeling. All are linear by
    // construction: salted/plain fact joins + rollups over
    // orders/lineitem, the curate chain and containment/minhash-eval
    // index joins over documents (the q_ngram_jaccard candidate
    // regime), and incremental CC (memoized base labeling + a
    // bounded-component fixpoint on the touched components).
    "q_salted_join", "q_join_agg", "q_self_join", "q_corpus_curate",
    "q_containment", "q_dedup_eval", "q_cc_incremental",
    // ── round 9: the blocked-ANN family ADMITTED (round-8 verdict
    // item 1). q_knn_graph/q_mutual_nn block on the label column, and
    // the generator now grows the label count ∝ rows (makeEmbeddings
    // nLabels) — rows-per-cell constant, within-cell pairs ∝ n, the
    // regime real deployments keep by growing k-means k with the
    // corpus. q_semdedup blocks on the sign signature: its smoke legs
    // scale nPlanes ∝ log₂(rows) via ScaledVariants below (cells =
    // 2^nPlanes ∝ n), base leg = the registry query verbatim. ──
    "q_knn_graph", "q_mutual_nn", "q_semdedup",
    // ── round 10 (verdict item 3): the last three by-design
    // exclusions admitted. q_triangles/q_kcore's notes predated the
    // round-7 generator change that scales nParts/nSupp/nCust with
    // the fact table — per-node degrees are CONSTANT under the
    // current generator (suppliers-per-part ~3, customers-per-
    // supplier ~600 at every factor), so wedge volume and peel work
    // grow ∝ n, not n². q_editdist_pairs gets the semdedup
    // treatment: its 16-char prefix block is an operator parameter a
    // real deployment re-tunes as the corpus grows, so the smoke's
    // scaled legs extend prefixLen ∝ log₂(factor) via ScaledVariants
    // (factor 1 = the registry query bit-for-bit); the engineered
    // twin pairs share any prefix, so output stays ∝ n and nonzero.
    "q_triangles", "q_kcore", "q_editdist_pairs",
    // round 12: the unigram-LM tokenizer trainer, EXPLICITLY admitted
    // (round-11 verdict item 4 asks for a smoke row; its 0.6 s sf0.1
    // wall sits under the 1.0 s auto-admit threshold because the
    // synthetic vocabulary is small — the corpus scan is the linear
    // part, everything after is |distinct-word|-bounded, which is the
    // property the 10× row demonstrates)
    "q_unigram_lm")

  // vector family (BENCH_r04 post-mortem: the poisoned artifact claimed
  // q_int8_topk at 249.8 s — a scale smoke over embeddings would have
  // proven that impossible from the artifact alone). Two scaling axes:
  //  - DIM-scaled (rows ×factor AND dim 64→512): per-row work grows
  //    ×DimFactor, so an accidentally quadratic-in-dim expression (the
  //    array_max-inlined-in-lambda trap) blows the ×(factor·DimFactor)
  //    work gate by another ×DimFactor;
  //  - ROW-scaled only: q_pq_adc's codebook layout is dim-tied (8
  //    subvectors × 8 dims), so it scales on the rows axis, which is
  //    what grows at 100 TB anyway (the codebook is a fixed index
  //    artifact).
  private val VectorDimQueries = Seq("q_int8_quant", "q_int8_topk",
    "q_cosine_topk", "q_knn_join", "q_ann_axis_oracle")
  // the round-6 verdict's heavy family: each gets a SECOND scale point
  // (HeavyFactor2×) so the smoke reports a fitted growth exponent, not
  // one ratio (see the heavy phase in main)
  private val HeavyQueries = Seq("q_corpus_build", "q_pagerank",
    "q_setsim_join", "q_dedup_components", "q_tf_cosine",
    // the blocked-ANN family's exponent representative (round-8
    // verdict item 1): the purest cell-blocked all-pairs kernel —
    // labels (cells) grow ∝ rows, so the pair volume and the exponent
    // should both read linear
    "q_knn_graph",
    // the two heaviest suite queries added in round 9's capability
    // sessions: the tokenizer-merge trainer (driver-loop of corpus
    // aggregates — each merge round is one scan + one fold) and HITS
    // (6 half-rounds of edge join + keyed sum, the q_pagerank shape)
    "q_bpe_train", "q_hits",
    // round-11 verdict item 2: the new iterative graph family —
    // PageRank-shaped but join-heavier (LPA's per-round argmax window
    // is partitioned by node id; Katz rides a bipartite edge list
    // ~2× the pagerank graph's) — admitted to the {10×,30×,100×} fit
    "q_katz_centrality", "q_lpa_communities")
  private val HeavyFactor2 = 30L

  /** Smoke-side parameter scaling for queries whose blocking-cell
    * count is an OPERATOR PARAMETER rather than a data column: the
    * registry pins q_semdedup at nPlanes=12 (4096 cells — right for
    * the sf corpora and the fixed oracle SQL), but cells must grow
    * ∝ rows for within-cell pairs to stay linear, exactly as a real
    * deployment re-tunes its k-means k as the corpus grows. At
    * factor f the smoke runs the SAME query shape with
    * nPlanes = 12 + ceil(log₂ f) — factor 1 reproduces the registry
    * query bit-for-bit, so the 1× leg stays the honest denominator.
    */
  private def semdedupScaled(factor: Long)
      : (SparkSession, String) => DataFrame = { (s, dir) =>
    val nPlanes = 12 +
      math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
    val emb = Tables.load(s, dir, "embeddings")
      .select("vec_id", "embedding")
    val aug = emb.union(emb.selectExpr(
      "vec_id + 100000 AS vec_id",
      "transform(embedding, x -> x * CAST(1.01 AS FLOAT)) AS embedding"))
    graft.operators.Similarity.semDedup(aug, "vec_id", "embedding",
        dim = 64, threshold = 0.95, nPlanes = nPlanes,
        axisBlocking = true)
      .orderBy("removed")
  }
  private def editdistPrefixLen(factor: Long): Int =
    16 + math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt

  /** q_editdist_pairs with the blocking prefix extended ∝ log₂(factor)
    * (the [[semdedupScaled]] treatment — block granularity is the
    * parameter a real deployment re-tunes as the corpus grows): each
    * extra prefix char multiplies the block count, so block
    * populations stay bounded while the engineered twins (same text,
    * suffix appended at the END) share every prefix and keep the
    * output ∝ n. Factor 1 reproduces the registry query bit-for-bit.
    */
  private def editdistScaled(factor: Long)
      : (SparkSession, String) => DataFrame = { (s, dir) =>
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    // twin-id offset derived from the corpus size (round-10 advice: the
    // fixed 100000 collides with real doc_ids once 5000·factor ≥ 100000,
    // i.e. factor ≥ 20 — silent duplicate ids corrupting pair
    // semantics). max() keeps factor 1 bit-identical to the registry
    // query (offset 100000 there too).
    val twinOff = math.max(100000L, 5000L * factor)
    val aug = docs.union(docs.select(
      (col("doc_id") + twinOff).as("doc_id"),
      concat(col("text"), lit(" qq zz")).as("text")))
    graft.operators.Dedup.editDistancePairs(aug, "doc_id", "text",
      prefixLen = editdistPrefixLen(factor), maxDist = 8)
  }

  // query name → (factor → builder); the 1× leg uses factor 1 (the
  // registry query exactly), scaled legs carry a scaled_param note in
  // the artifact row
  private val ScaledVariants
      : Map[String, Long => (SparkSession, String) => DataFrame] =
    Map("q_semdedup" -> (f => semdedupScaled(f)),
      "q_editdist_pairs" -> (f => editdistScaled(f)))
  private def scaledParamNote(name: String, factor: Long): String =
    if (name == "q_semdedup") {
      val np = 12 +
        math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
      s"nPlanes=$np"
    } else if (name == "q_editdist_pairs")
      s"prefixLen=${editdistPrefixLen(factor)}"
    else ""

  private val VectorRowQueries = Seq("q_pq_adc",
    // recall eval: fixed 10-query exact scan + 256-bucket signature
    // probes — both linear on the rows axis (the codebook/query set
    // is a fixed artifact, like PQ's)
    "q_ann_recall",
    // MRR eval: fixed 10-query set broadcast against the corpus —
    // two linear passes (exact cosine + quantized dot) per row
    "q_mrr",
    // round-8 ledger-audit admission (1.3 s at sf0.1, not sub-second):
    // IVF codebook build — bounded ≤32-row collects, linear scans
    "q_ivf_build")
  private val DimFactor = 8L // 64 → 512

  // all ≥ 7 chars: the curation chain's quality score weights the
  // alphabetic ratio (letters vs spaces), and q_corpus_build curates at
  // 0.91 — short-word soup scores ~0.90 and the whole corpus vanishes.
  // None of these collide with the de/fr/es stopword profiles, so the
  // stopword mix below keeps langid firmly "en".
  private val Vocab = Seq("cluster", "pipeline", "storage", "compute",
    "shuffle", "partition", "broadcast", "executor", "catalyst",
    "parquet", "streaming", "windowing", "session", "quantile",
    "sketches", "segment", "columnar", "vectors", "indexes", "buffers",
    "schemas", "catalogs", "latency", "machine", "learning", "dataset",
    "sampling", "packing", "chunking", "scoring", "filters", "dedupes",
    "hashing", "joining", "sorting", "caching", "spilling", "pruning",
    "codegen", "metrics")

  // every third word is an English stopword so the curation chain's
  // stopword langid classifies the corpus "en" (otherwise every doc is
  // "und" and the keep-list filters the whole corpus — a 0-row smoke)
  private val EnStops = Seq("the", "a", "of", "and", "to", "in", "is",
    "it", "that", "for")

  // alphabetic suffixes composed onto the stems: 40×40 = 1600 effective
  // words, so the 5-gram shingle space is large enough that shingles
  // don't collide across unrelated documents — with a 40-word vocab the
  // shared-shingle verification join goes QUADRATIC at 10× (each
  // shingle shared by ~10 docs), which is a generator artifact, not an
  // engine property; real corpora have 100k+ vocabularies
  private val Suffixes = Seq("ion", "ment", "ness", "able", "ful",
    "ish", "ist", "ing", "ed", "ly", "er", "est", "ous", "ive", "al",
    "ic", "ary", "dom", "ship", "hood", "ward", "wise", "like", "less",
    "most", "some", "fold", "ery", "age", "ance", "ence", "ity", "ism",
    "ure", "ade", "ette", "let", "ling", "kin", "een")

  /** documents: word-soup text from a stem×suffix vocab (large shingle
    * space, high alpha ratio), 40-199 words, hash-derived lang/source —
    * byte-identical on every run at every parallelism.
    */
  def makeDocuments(spark: SparkSession, n: Long): DataFrame = {
    val words = array(Vocab.map(lit): _*)
    val sufs = array(Suffixes.map(lit): _*)
    val stops = array(EnStops.map(lit): _*)
    spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), (pmod(xxhash64(col("id")), lit(160L)) + 40L)
          .cast("int")),
        j => when(j % 3 === 0, element_at(stops,
            (pmod(xxhash64(col("id"), j, lit(7L)),
              lit(EnStops.size.toLong)) + 1L).cast("int")))
          .otherwise(concat(
            element_at(words,
              (pmod(xxhash64(col("id"), j), lit(Vocab.size.toLong)) + 1L)
                .cast("int")),
            element_at(sufs,
              (pmod(xxhash64(col("id"), j, lit(13L)),
                lit(Suffixes.size.toLong)) + 1L).cast("int"))))))
        .as("text"),
      element_at(array(Seq("en", "zh", "de", "fr", "es").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(1L)), lit(5L)) + 1L).cast("int"))
        .as("lang"),
      concat(lit("src"), pmod(xxhash64(col("id"), lit(2L)), lit(3L)))
        .as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** events: per-user streams with hash-jittered timestamps — users
    * scale WITH n so per-user row counts stay constant (the group
    * cardinality scaling a real corpus has).
    */
  def makeEvents(spark: SparkSession, n: Long, nUsers: Long): DataFrame =
    spark.range(n).select(
      col("id").as("event_id"),
      // NANOSECOND long epoch — the shape Tables.load gives the sf
      // events table (whatever the parquet encoding, ts surfaces as
      // LongType epoch-nanos; see Tables.normalizeTs).
      // ~0.94 s stride: the corpus spans more hourly bars as n grows
      (lit(1704067200000000000L) + col("id") * 937000000L +
        pmod(xxhash64(col("id")), lit(911111111L))).as("ts"),
      pmod(xxhash64(col("id"), lit(3L)), lit(nUsers)).as("user_id"),
      // the sf testdata's exact type domain, so type-filtered queries
      // (funnel, pattern match, asof, funnel-latency) exercise real
      // matches here too
      element_at(
        array(Seq("click", "view", "purchase", "error", "signup")
          .map(lit): _*),
        (pmod(xxhash64(col("id"), lit(4L)), lit(5L)) + 1L).cast("int"))
        .as("event_type"),
      round(pmod(xxhash64(col("id"), lit(5L)), lit(10000L)) / 100.0, 2)
        .as("value"),
      concat(lit("{\"k\": "), pmod(xxhash64(col("id"), lit(6L)), lit(100L)),
        lit("}")).as("props"))

  /** embeddings: hash-derived uniform [-1, 1) components — same schema
    * as the sf dirs (vec_id bigint, embedding float[], label int),
    * byte-identical on every run at every parallelism.
    *
    * `nLabels` scales WITH n (the round-8 verdict's blocked-ANN item):
    * labels are the blocking cells of q_knn_graph/q_mutual_nn, and a
    * real deployment's cell count grows with the corpus (k-means k ∝ n,
    * labels from a bounded-size clusterer) — rows-per-cell stays
    * constant, so within-cell candidate pairs grow ∝ n, not n². The
    * base scale keeps the sf dirs' 10-label domain.
    */
  def makeEmbeddings(spark: SparkSession, n: Long, dim: Int,
      nLabels: Long = 10L): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(dim)),
        j => ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L) / 1000.0)
          .cast("float")).as("embedding"),
      pmod(xxhash64(col("id"), lit(9L)), lit(nLabels)).cast("int")
        .as("label"))

  // o_orderdate = 1995-01-01 + hash(o_orderkey) days over ~6.6 years —
  // the sf testdata's exact span, so the TPC-H date windows
  // ([1996,1998) Q5, [1996-07-01,…) Q10, [1997-09,1997-10) Q14 …) all
  // keep their intended selectivity at every scale. Factored out so
  // makeLineitem can derive l_shipdate ≥ its order's date WITHOUT a
  // join (both sides hash the same orderkey).
  private def orderDateMicros(okey: Column): Column =
    lit(788918400000000L) +
      pmod(xxhash64(okey, lit(15L)), lit(2400L)) * 86400000000L

  /** orders: hash-derived custkey/price over `nCust` customers — both
    * sides of the bloom join scale together, the worst case for the
    * constant-size bitmap's selectivity claim.
    */
  def makeOrders(spark: SparkSession, n: Long, nCust: Long): DataFrame =
    spark.range(n).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(11L)), lit(nCust)).as("o_custkey"),
      element_at(array(Seq("P", "O", "F").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(17L)), lit(3L)) + 1L).cast("int"))
        .as("o_orderstatus"),
      round(pmod(xxhash64(col("id"), lit(12L)), lit(5000000L)) / 100.0, 2)
        .as("o_totalprice"),
      element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED", "5-LOW").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(13L)), lit(5L)) + 1L).cast("int"))
        .as("o_orderpriority"),
      timestamp_micros(orderDateMicros(col("id"))).as("o_orderdate"))

  /** customer: acctbal uniform [0, 10000) so the registered bloom
    * join's `> 7500` dim filter keeps ~25% of keys at every scale;
    * mktsegment from the sf domain so the segment rollups
    * (q_pareto, q_tpch_q3, q_bucket_join) keep 5 non-empty groups.
    */
  def makeCustomer(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      pmod(xxhash64(col("id"), lit(16L)), lit(25L)).cast("int")
        .as("c_nationkey"),
      round(pmod(xxhash64(col("id"), lit(14L)), lit(1000000L)) / 100.0, 2)
        .as("c_acctbal"),
      element_at(array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(18L)), lit(5L)) + 1L).cast("int"))
        .as("c_mktsegment"))

  /** lineitem: the columns the registry's lineitem queries touch —
    * orderkeys land on the orders generator's key space so the
    * pagerank graph join is non-degenerate, suppkeys on a ×shrink
    * smaller space so the customer↔supplier graph has real hubs.
    * `nParts` scales WITH the fact table (a real catalog grows with
    * its sales), which keeps suppliers-per-part — and so every
    * co-occurrence projection through parts — density-constant at
    * scale. l_shipdate is the ORDER's date plus 1–95 days of hash
    * jitter (derived from the shared orderkey hash, no join), so
    * ship-after-order invariants and the ±30-day lateness split
    * (q_late_shipments) hold at every scale.
    */
  def makeLineitem(spark: SparkSession, n: Long, nOrders: Long,
      nSupp: Long, nParts: Long = 20000L): DataFrame =
    spark.range(n).select(
      pmod(xxhash64(col("id"), lit(21L)), lit(nOrders)).as("l_orderkey"),
      pmod(xxhash64(col("id"), lit(22L)), lit(nSupp)).as("l_suppkey"),
      pmod(xxhash64(col("id"), lit(31L)), lit(nParts)).as("l_partkey"),
      (pmod(xxhash64(col("id"), lit(27L)), lit(7L)) + 1L)
        .cast("int").as("l_linenumber"),
      round(pmod(xxhash64(col("id"), lit(28L)), lit(11L)) / 100.0, 2)
        .as("l_discount"),
      round(pmod(xxhash64(col("id"), lit(29L)), lit(9L)) / 100.0, 2)
        .as("l_tax"),
      (pmod(xxhash64(col("id"), lit(23L)), lit(50L)) + 1L)
        .cast("double").as("l_quantity"),
      // POWER-LAW part values (round-7 verdict item 8): an
      // approximately mean-preserving log-uniform per-PART multiplier
      // {1,2,4,8} on a quarter-scale base draw (E[mult]=3.75, base
      // /400 vs /100 ⇒ overall mean 0.9375× the original; max price
      // doubles to ~200k), so per-part aggregate values keep a heavy
      // tail at every scale — real catalogs are Zipfian, and
      // uniform-only prices made q_tpch_q11's above-average cutoff go
      // 0-row here (CLT tightening on rows-per-part, not an engine
      // property). The mult∈{8} quarter of parts clears the
      // 1.5×-average cutoff at any factor. Near-original magnitude ON
      // PURPOSE: corpus revenue totals stay at the original scale, so
      // micro-grid revenue ratios elsewhere in the registry
      // (q_tpch_q14's promo share was within 1.6× of int64 at 10×
      // already) keep their headroom. No registry predicate thresholds
      // on price magnitude (grep-checked: only a `<= 0` DQ probe), so
      // other smoke selectivities are unaffected.
      round(pmod(xxhash64(col("id"), lit(24L)), lit(10000000L)) / 400.0 *
        pow(lit(2.0),
          pmod(xxhash64(pmod(xxhash64(col("id"), lit(31L)), lit(nParts)),
            lit(33L)), lit(4L)).cast("double")), 2)
        .as("l_extendedprice"),
      element_at(array(Seq("A", "N", "R").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(25L)), lit(3L)) + 1L).cast("int"))
        .as("l_returnflag"),
      element_at(array(Seq("F", "O").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(26L)), lit(2L)) + 1L).cast("int"))
        .as("l_linestatus"),
      timestamp_micros(orderDateMicros(
          pmod(xxhash64(col("id"), lit(21L)), lit(nOrders))) +
        (pmod(xxhash64(col("id"), lit(32L)), lit(95L)) + 1L) *
          86400000000L)
        .as("l_shipdate"))

  /** part: the sf schema + value domains (Brand#1–25, the six p_type
    * classes incl. PROMO/STANDARD, p_size 1–50, retailprice
    * 900–999.99, ~1/6 of names starting "red" for Q20's prefix
    * filter) so every part-side TPC-H predicate keeps its intended
    * selectivity at every scale.
    */
  def makePart(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("p_partkey"),
      concat(
        element_at(array(Seq("red", "blue", "green", "hot", "small",
            "large").map(lit): _*),
          (pmod(xxhash64(col("id"), lit(41L)), lit(6L)) + 1L)
            .cast("int")),
        lit(" "),
        element_at(array(Seq("widget", "gear", "bolt", "ring", "gizmo")
            .map(lit): _*),
          (pmod(xxhash64(col("id"), lit(42L)), lit(5L)) + 1L)
            .cast("int"))).as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(col("id"), lit(43L)), lit(25L)) + 1L).as("p_brand"),
      element_at(array(Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO",
          "SMALL", "STANDARD").map(lit): _*),
        (pmod(xxhash64(col("id"), lit(44L)), lit(6L)) + 1L).cast("int"))
        .as("p_type"),
      (pmod(xxhash64(col("id"), lit(45L)), lit(50L)) + 1L).cast("int")
        .as("p_size"),
      round(lit(900.0) +
        pmod(xxhash64(col("id"), lit(46L)), lit(10000L)) / 100.0, 2)
        .as("p_retailprice"))

  /** supplier: nationkeys on the fixed 25-nation domain (the
    * customer generator's), acctbal uniform like the sf table.
    */
  def makeSupplier(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(col("id"), lit(47L)), lit(25L)).cast("int")
        .as("s_nationkey"),
      round(pmod(xxhash64(col("id"), lit(48L)), lit(1000000L)) / 100.0, 2)
        .as("s_acctbal"))

  /** nation/region: the sf testdata's EXACT fixed contents (25
    * nations round-robined over 5 regions) — dimension enums don't
    * scale with the fact tables, which is precisely what keeps their
    * broadcasts broadcast-able at 100 TB.
    */
  def makeNation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey"))

  def makeRegion(spark: SparkSession): DataFrame =
    spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      element_at(array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
          "MIDDLE EAST").map(lit): _*),
        (col("id") + 1).cast("int")).as("r_name"))

  private def writeDir(spark: SparkSession, dir: String, factor: Long,
      tables: Set[String] = Set.empty): Unit = {
    def want(t: String) = tables.isEmpty || tables(t)
    def put(t: String, df: => DataFrame): Unit = if (want(t))
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    put("documents", makeDocuments(spark, 5000L * factor))
    put("events", makeEvents(spark, 100000L * factor, 1000L * factor))
    // base matches sf0.1's embeddings shape (2k rows, dim 64, 10
    // labels); the row-scaled dir keeps dim 64 and grows the label
    // (blocking-cell) count with the rows — see makeEmbeddings
    put("embeddings", makeEmbeddings(spark, 2000L * factor, 64,
      nLabels = 10L * factor))
    // base matches sf0.1's orders/customer/lineitem/part/supplier
    // shape (150k / 15k / 600k / 20k / 1k rows); nation/region are
    // FIXED dimension enums at every scale, like TPC-H itself
    put("orders", makeOrders(spark, 150000L * factor, 15000L * factor))
    put("customer", makeCustomer(spark, 15000L * factor))
    put("lineitem", makeLineitem(spark, 600000L * factor,
      150000L * factor, 1000L * factor, 20000L * factor))
    put("part", makePart(spark, 20000L * factor))
    put("supplier", makeSupplier(spark, 1000L * factor))
    put("nation", makeNation(spark))
    put("region", makeRegion(spark))
  }

  // ── machine-readable exclusion ledger (round-7 verdict item 7;
  // AUTOMATED round 9 per the round-8 verdict item 2): every
  // registered query NOT in the smoke, with a reason class, so
  // coverage is auditable from the artifact instead of from comments.
  // The by-design exclusions carry their specific generator-artifact
  // notes; ot_* queries are engine-dialect (driven by the OLTP engine
  // surface — sbt specs + ot_ correctness rows — not scan-shaped table
  // reads); EVERYTHING ELSE derives its label from the measured
  // BENCH_FULL wall time: below AdmitThresholdS it is labeled with the
  // measured number, at/above it it is AUTO-ADMITTED into the smoke
  // run — a query that drifts across the threshold flips itself in
  // without a code edit (round 8's hand audit found 8 mislabeled
  // entries; this closes that class).
  // round 10: the q_editdist_pairs/q_triangles/q_kcore by-design
  // entries are GONE — all three are admitted to the smoke (see the
  // round-10 wave note in QueryNames).
  private val ExcludedReasons: Map[String, String] = Map.empty

  /** Auto-admission threshold: a query at/above this measured sf0.1
    * wall time carries real scale signal and joins the smoke; below
    * it, the family representative already smoked covers its shape.
    */
  private val AdmitThresholdS = 1.0

  /** Per-query sf0.1 wall seconds for the auto-admit decision: the
    * per-query MAX over the TWO newest committed full-bench artifacts
    * (BENCH_FULL*.json in the repo root; SPARK_GRAFT_BENCH_ARTIFACT,
    * when set, is always one of them). Round-10 verdict item 5: five
    * queries straddled the 1.0 s threshold across bench runs and
    * flapped in and out of the smoke on host variance — max over two
    * rounds means a query admitted last round stays admitted unless it
    * measured sub-threshold twice running. Empty map when no artifact
    * exists — unmeasured queries stay excluded with an "unmeasured"
    * label rather than guessing.
    */
  private[graft] def benchWalls(): Map[String, Double] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val envPath = sys.env.get("SPARK_GRAFT_BENCH_ARTIFACT")
      .map(Paths.get(_)).filter(Files.exists(_))
    val repoPaths = {
      val cwd = Paths.get(".")
      Files.list(cwd).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("BENCH_FULL") && n.endsWith(".json")
        }
        .toSeq.sortBy(p => -Files.getLastModifiedTime(p).toMillis)
    }
    val paths = (envPath.toSeq ++ repoPaths.filterNot(p =>
      envPath.exists(e => Files.isSameFile(e, p)))).take(2)
    paths.map { p =>
      val txt = Files.readString(p)
      // the artifact's flat per-query map: "queries":{"q_x":0.123,…}
      val obj = """"queries"\s*:\s*\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      """"([A-Za-z0-9_]+)"\s*:\s*([0-9.eE+\-]+)""".r
        .findAllMatchIn(obj)
        .flatMap(m => scala.util.Try(m.group(1) -> m.group(2).toDouble)
          .toOption)
        .toMap
    }.foldLeft(Map.empty[String, Double]) { (acc, m) =>
      (acc.keySet ++ m.keySet).map(k =>
        k -> math.max(acc.getOrElse(k, -1.0), m.getOrElse(k, -1.0))).toMap
    }
  }

  /** Query names with a MAIN-PHASE row (t1_s present) in the newest
    * two committed smoke artifacts (SMOKE_r*.json / SMOKE_*.json in
    * the repo root) — the sticky half of the admit rule (round-10
    * verdict item 5): once a query has smoked, it stays admitted even
    * when a later bench run lands a hair under the threshold, so the
    * smoke's coverage can't flap on which side of 1.0 s a
    * host-variance coin lands.
    */
  private[graft] def previouslySmoked(): Set[String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val files = {
      val cwd = Paths.get(".")
      if (!Files.isDirectory(cwd)) Seq.empty
      else Files.list(cwd).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("SMOKE_") && n.endsWith(".json")
        }
        .toSeq.sortBy(p => -Files.getLastModifiedTime(p).toMillis)
        .take(2)
    }
    files.flatMap { p =>
      val txt = scala.util.Try(Files.readString(p)).getOrElse("")
      """\{"query":"([A-Za-z0-9_]+)","t1_s":""".r
        .findAllMatchIn(txt).map(_.group(1))
    }.toSet
  }

  /** (auto-admitted names, excluded ledger rows as (name, reason,
    * wall_s option)) — derived from the measured walls (max over the
    * two newest bench artifacts) plus sticky admission from the
    * previous round's smoke rows.
    */
  private def deriveCoverage(walls: Map[String, Double],
      sticky: Set[String] = previouslySmoked())
      : (Seq[String], Seq[(String, String, Option[Double])]) = {
    val static = (QueryNames ++ VectorDimQueries ++ VectorRowQueries).toSet
    val out = SparkEntry.queries.keys.toSeq.sorted.filterNot(static)
    val (admitted, excluded) = out.partition { n =>
      !n.startsWith("ot_") && !ExcludedReasons.contains(n) &&
        (walls.get(n).exists(_ >= AdmitThresholdS) || sticky(n))
    }
    val ledger = excluded.map { n =>
      val w = walls.get(n)
      val reason =
        if (n.startsWith("ot_"))
          "engine-dialect: OLTP engine surface (sbt specs + ot_ " +
            "correctness rows), not a scan-shaped table read"
        else ExcludedReasons.getOrElse(n, w match {
          case Some(s) =>
            f"below-cost-threshold: measured $s%.3f s at sf0.1 < " +
              f"$AdmitThresholdS%.1f s (max over the two newest bench " +
              "artifacts, never previously smoked); scale shape " +
              "covered by its family's heavy representative"
          case None =>
            "unmeasured: absent from the bench artifact's per-query map"
        })
      (n, reason, w)
    }
    (admitted, ledger)
  }

  private def sig(m: Map[String, Int]): String =
    m.toSeq.sortBy(_._1).collect { case (k, v) if v > 0 => s"$k=$v" }
      .mkString(",")

  /** Plan-shape signature of the FINAL adaptive plan: the node kinds
    * whose count changing at scale means the plan regressed.
    */
  private def signature(df: DataFrame): Map[String, Int] = {
    val p = df.queryExecution.executedPlan.toString
    Seq("ShuffleQueryStage", "BroadcastHashJoin", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(k => k -> k.r.findAllIn(p).length).toMap
  }

  private def runOne(spark: SparkSession, name: String, dir: String,
      warm: Boolean = false,
      build: Option[(SparkSession, String) => DataFrame] = None,
      nRuns: Int = 2)
      : (Double, Long, Map[String, Int]) = {
    val builder = build.getOrElse(SparkEntry.queries(name))
    // warm=true (the 1× point): one UNTIMED run first. The base scale
    // is where first-exercise JIT and codegen compilation land, and a
    // 2× swing on a 2-4 s t1 swings every ratio gate with it (round-7
    // verdict item 5: same-code time_ratio 12.2 vs 20.9 across two
    // runs of q_corpus_build) — a warm-up run costs ~nothing at 1×
    // and pins the denominator
    if (warm) {
      builder(spark, dir).queryExecution.toRdd.count()
      spark.catalog.clearCache()
    }
    val runs = (0 until nRuns).map { _ =>
      // the timer wraps the BUILDER too (same contract as Bench):
      // queries with eager stats/fixpoint phases (q_ntile's count pass,
      // q_dedup_components' propagation rounds) do real work before the
      // final DataFrame exists, and that work must be inside the clock
      val t0 = System.nanoTime()
      val df = builder(spark, dir)
      // DRIVER-SAFE row count: execute the final physical plan
      // distributed and count per-partition — the driver receives one
      // long per partition, never the rows, so a huge-output query
      // can't OOM the smoke. toRdd runs the ALREADY-PLANNED tree (final
      // projection included); a DataFrame.count() would instead let
      // Catalyst prune the output expressions out of the timed work.
      val rows = df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val sig = signature(df) // final: the execution drove AQE to the end
      spark.catalog.clearCache()
      (dt, rows, sig)
    }
    runs.minBy(_._1)
  }

  /** Bounded output probe (base scale only): k real rows through a
    * fresh plan — catches a query whose distributed count "works" but
    * whose rows are garbage/unreadable, without ever collecting an
    * unbounded result.
    */
  private def probeOne(spark: SparkSession, name: String, dir: String,
      k: Int = 3): Unit = {
    SparkEntry.queries(name)(spark, dir).limit(k).collect()
    spark.catalog.clearCache()
  }

  /** Recursive delete, best-effort (hygiene, not correctness). */
  private def deleteDir(d: String): Unit = try {
    val root = java.nio.file.Paths.get(d)
    if (java.nio.file.Files.exists(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally s.close()
    }
  } catch { case e: Throwable =>
    System.err.println(s"[smoke] cleanup of $d failed: ${e.getMessage}")
  }

  /** Sweep stale graft scratch dirs left in the system tmpdir by
    * EARLIER runs (a crashed or killed run never reaches its own
    * cleanup — r10's full run died when the 100× spill landed on
    * ~44 GB of exactly such leftovers). Only graft-prefixed dirs are
    * touched, and only ones older than this process's start.
    */
  private def sweepStaleTmp(): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val started = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getStartTime
    try {
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.startsWith("graft-scale-") || n.startsWith("graft-bench-")) &&
            java.nio.file.Files
              .getLastModifiedTime(p).toMillis < started
        }
        .foreach(p => deleteDir(p.toString))
      finally s.close()
    } catch { case e: Throwable =>
      System.err.println(s"[smoke] stale-tmp sweep failed: ${e.getMessage}")
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toLong).getOrElse(10L)
    // optional 2nd arg: comma-separated query-name filter (local
    // iteration aid — smoke only the names given; the full list
    // otherwise)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // single-JVM suite hygiene: shuffle files are only deleted when
      // the driver GC collects their RDD references (ContextCleaner),
      // and the default 30min periodic GC never fires inside a ~40min
      // suite — by the tail, heavy queries were paying disk/page-cache
      // pressure from 130 earlier queries' dead shuffles (measured:
      // q_tf_cosine's 30× leg 78s isolated vs 141s at suite position
      // ~last; exponent 0.96 vs 1.60)
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    sweepStaleTmp()
    val base = java.nio.file.Files.createTempDirectory("graft-scale-1").toString
    val big = java.nio.file.Files.createTempDirectory(s"graft-scale-$factor").toString
    val bigVec = java.nio.file.Files.createTempDirectory("graft-scale-vec").toString
    writeDir(spark, base, 1L)
    writeDir(spark, big, factor)
    // the dim-scaled embeddings dir: rows ×factor AND dim 64→512
    makeEmbeddings(spark, 2000L * factor, (64L * DimFactor).toInt)
      .write.mode("overwrite").parquet(s"$bigVec/embeddings.parquet")
    // warm the codegen families once so first-exercise JIT doesn't land
    // inside a timed run (same reason as Bench's warm-up list)
    (QueryNames.take(3) :+ "q_cosine_topk").foreach(n =>
      SparkEntry.queries(n)(spark, base).write.format("noop")
        .mode("overwrite").save())
    var bad = 0
    // every emitted row is buffered and written as ONE committed JSON
    // artifact at exit (round-7 verdict item 2: both smoke and bench
    // evidence died in /tmp; the artifact is the run's full record)
    val emitted = scala.collection.mutable.Buffer[String]()
    def emit(s: String): Unit = { println(s); emitted += s }
    // the automated coverage derivation (round-8 verdict item 2):
    // measured walls from the newest committed bench artifact decide
    // who is auto-admitted and what the exclusion ledger says
    val walls = benchWalls()
    val (autoAdmitted, ledger0) = deriveCoverage(walls)
    if (autoAdmitted.nonEmpty)
      System.err.println(s"[smoke] auto-admitted (>= $AdmitThresholdS s " +
        s"at sf0.1): ${autoAdmitted.mkString(", ")}")
    // auto-admitted queries were never hand-checked against the smoke
    // generator's tables; a failure is a LEDGER entry, not a crash
    val ledgerExtra =
      scala.collection.mutable.Buffer[(String, String, Option[Double])]()
    // (name, scaled dir, expected WORK ratio, auto?): documents/events
    // and the row-scaled vector queries grow ×factor; the dim-scaled
    // vector queries grow ×(factor · DimFactor) per the scan's
    // rows×dim work. Top-k outputs have CONSTANT row counts, so the
    // work ratio — not the output-row ratio — is the right yardstick
    // for them.
    val cases = (
      QueryNames.map(n => (n, big, factor.toDouble, false)) ++
      VectorRowQueries.map(n => (n, big, factor.toDouble, false)) ++
      VectorDimQueries.map(n =>
        (n, bigVec, (factor * DimFactor).toDouble, false)) ++
      autoAdmitted.map(n => (n, big, factor.toDouble, true))
    ).filter { case (n, _, _, _) => only.forall(_.contains(n)) }
    val timed = scala.collection.mutable.Map[String, Double]()
    val results = cases.flatMap { case (name, bigDir, workRatio, auto) =>
      // queries whose blocking-cell count is an operator parameter get
      // the factor-scaled builder at each leg (factor 1 = the registry
      // query exactly); everything else runs the registry query
      def builderFor(f: Long) = ScaledVariants.get(name).map(_(f))
      val attempt = scala.util.Try {
        val (t1, r1, s1) = runOne(spark, name, base, warm = true,
          build = builderFor(1L))
        probeOne(spark, name, base) // k real rows, bounded, untimed
        (t1, r1, s1)
      }
      attempt match {
        case scala.util.Failure(e) if auto =>
          ledgerExtra += ((name,
            s"generator-incompatible: ${e.getClass.getSimpleName} at " +
              "base scale — auto-admission attempted, query reads " +
              "inputs the smoke generator does not synthesize",
            walls.get(name)))
          None
        case scala.util.Failure(e) => throw e
        case scala.util.Success((t1, r1, s1)) =>
      val (tN, rN, sN) = runOne(spark, name, bigDir,
        build = builderFor(factor))
      timed(name) = tN
      val rowRatio = if (r1 > 0) rN.toDouble / r1 else workRatio
      val timeRatio = tN / math.max(t1, 1e-3)
      // hard plan gate: a nested-loop/cartesian join appearing at scale
      // always fails; shuffle-stage growth fails only WITHOUT an
      // accompanying join-strategy change (a broadcast→SMJ flip adds
      // exchanges by design when both sides scale together — AQE doing
      // its job, reported via strategy_flip; growth with strategies
      // unchanged means an accidental new repartition)
      val strategyFlip = sN("SortMergeJoin") != s1("SortMergeJoin") ||
        sN("BroadcastHashJoin") != s1("BroadcastHashJoin")
      val pathology =
        sN("BroadcastNestedLoopJoin") > s1("BroadcastNestedLoopJoin") ||
        sN("CartesianProduct") > s1("CartesianProduct")
      val shuffleGrowth =
        sN("ShuffleQueryStage") > s1("ShuffleQueryStage") * 1.15 + 2
      val planOk = !pathology && (!shuffleGrowth || strategyFlip)
      // gate: ≤ 3× per unit of expected work (generous for n·log n +
      // fixed overheads), and no structural pathology. For the
      // dim-scaled vector family a quadratic-in-dim expression (the
      // inlined-array_max trap) overshoots this by another ×DimFactor.
      val timeOk = timeRatio <= 3.0 * math.max(rowRatio, workRatio)
      if (!planOk || !timeOk) bad += 1
      val note = scaledParamNote(name, factor)
      val noteJson =
        if (note.nonEmpty) s""","scaled_param":"$note"""" else ""
      val autoJson = if (auto) s""","auto_admitted":true""" else ""
      emit(s"""{"query":"$name","t1_s":${f"$t1%.3f"},""" +
        s""""t${factor}_s":${f"$tN%.3f"},"rows1":$r1,"rows$factor":$rN,""" +
        s""""time_ratio":${f"$timeRatio%.2f"},"work_ratio":$workRatio,""" +
        s""""plan_ok":$planOk,"strategy_flip":$strategyFlip,""" +
        s""""time_ok":$timeOk,""" +
        s""""sig1":"${sig(s1)}","sig$factor":"${sig(sN)}"""" +
        noteJson + autoJson + "}")
      Some((name, timeRatio, planOk && timeOk))
      }
    }
    // ── second AND third scale points for the heavy family: factor →
    // 30× → 100× gives a growth EXPONENT fitted by least squares over
    // log t vs log f across all three legs (round-10 verdict item 1 —
    // the brief's bar is plans that survive 100×, so the evidence now
    // reaches it). Fixed overheads are amortized over the top segment,
    // and a hidden quadratic term that a single 10× ratio absorbs into
    // its 3× slack shows up as slope ≥ 2 on the 30→100 leg. Gated
    // < 1.5 for these linear-by-construction pipelines. The 100× leg
    // runs ONCE per query (not best-of-2 — it is the round's largest
    // single cost and the fit has two other points to anchor it);
    // SPARK_GRAFT_HEAVY_MAX=30 turns it off for quick local runs. ──
    val heavyMax = sys.env.get("SPARK_GRAFT_HEAVY_MAX")
      .map(_.toLong).getOrElse(100L)
    val heavyCases = HeavyQueries
      .filter(n => only.forall(_.contains(n)))
      .filter(n => timed.contains(n) && factor < HeavyFactor2)
    // heavyFactors can be EMPTY (SPARK_GRAFT_HEAVY_MAX below 30): a
    // single-point "fit" divides by zero and the emit below would
    // build invalid JSON — skip the whole phase instead (the main
    // phase already covered these queries at `factor`)
    val heavyFactors = Seq(HeavyFactor2, 100L)
      .filter(_ <= heavyMax).distinct
    if (heavyCases.nonEmpty && heavyFactors.nonEmpty) {
      val heavyTables = Set("documents", "orders", "lineitem",
        "embeddings")
      // disk hygiene (round-10 verdict item 3: the r10 full run died
      // in q_tf_cosine's 100× spill on ~44 GB of stale /tmp left by
      // earlier same-round runs): before generating a leg's data,
      // assert usable headroom ≥ 2× the projected dir footprint
      // (scaled from the already-written dirs); a failed check drops
      // that factor from the fit — a single-segment artifact with an
      // honest "headroom_limited" flag beats a crashed run assembled
      // from pieces.
      def usableBytes: Long = java.nio.file.Files
        .getFileStore(java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"))).getUsableSpace
      def dirBytes(d: String): Long = {
        val root = java.nio.file.Paths.get(d)
        if (!java.nio.file.Files.isDirectory(root)) 0L
        else {
          val s = java.nio.file.Files.walk(root)
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum
          finally s.close()
        }
      }
      val bigBytes = dirBytes(big)
      var headroomLimited = List.empty[Long]
      val heavyDirs = heavyFactors.flatMap { f =>
        val projected = bigBytes / factor * f * 2
        if (usableBytes < projected + (8L << 30)) {
          System.err.println(s"[smoke] skipping factor $f: usable " +
            s"disk ${usableBytes >> 30} GiB < projected " +
            s"${(projected + (8L << 30)) >> 30} GiB")
          headroomLimited ::= f
          None
        } else {
          val d = java.nio.file.Files
            .createTempDirectory(s"graft-scale-$f").toString
          writeDir(spark, d, f, tables = heavyTables)
          Some(f -> d)
        }
      }
      heavyCases.foreach { name =>
        // ALL fit points are measured back-to-back in the SAME suite
        // state: the main-phase t10 rides a lighter pollution regime
        // than legs run after hundreds of queries (and after earlier
        // heavy queries' 100× legs), and that regime gap lands
        // entirely on the 10→30 step of the fit — the committed r10
        // first run read q_knn_graph at exponent 1.64 from a 6×
        // regime inflation (its isolated exponent is 0.76, and its
        // own 30→100 slope in the same run was 1.02). The 10× anchor
        // is therefore RE-MEASURED here, post-GC, immediately before
        // the big legs — and taken as min(re-measured, main-phase
        // suite wall) (round-10 verdict item 1: the r10 re-measured
        // q_bpe_train anchor came back 6× its own suite wall and
        // DEFLATED the fit to a degenerate 0.167; min() bounds
        // one-sided inflation noise from either regime). The
        // mid-suite wall is still reported as t{factor}_suite_s.
        System.gc()
        val (tAnchorRaw, _, _) = runOne(spark, name, big,
          build = ScaledVariants.get(name).map(_(factor)))
        val tN = timed(name)
        val tAnchor = math.min(tAnchorRaw, tN)
        var legs = heavyDirs.map { case (f, d) =>
          System.gc()
          val (t, r, _) = runOne(spark, name, d,
            build = ScaledVariants.get(name).map(_(f)),
            nRuns = if (f >= 100L) 1 else 2)
          (f, t, r, d)
        }
        // MONOTONICITY gate (round-10 verdict item 1): walls must not
        // DECREASE as the factor grows — every heavy query does
        // ≥ linear total work, so an inversion is a measurement
        // failure, not scaling evidence, and the <1.5 exponent gate
        // cannot catch an anchor/leg corruption that deflates the
        // slope. One repair pass: the SMALLER-factor side of each
        // inversion (the suspected-inflated point) is re-measured
        // once and the min kept (the 100× leg is never re-run — as
        // the largest factor it can only be the deflated side).
        def inverted(ls: Seq[(Long, Double, Long, String)]): Boolean = {
          val walls = (factor, tAnchor) +: ls.map(l => (l._1, l._2))
          walls.sliding(2).exists(w => w(0)._2 > w(1)._2)
        }
        if (inverted(legs)) {
          legs = legs.zipWithIndex.map { case ((f, t, r, d), i) =>
            val next = legs.drop(i + 1).headOption.map(_._2)
            if (next.exists(_ < t)) {
              System.gc()
              val (t2, _, _) = runOne(spark, name, d,
                build = ScaledVariants.get(name).map(_(f)),
                nRuns = 1)
              (f, math.min(t, t2), r, d)
            } else (f, t, r, d)
          }
        }
        val monotonic = !inverted(legs)
        // least-squares slope of log t on log f over all legs
        val pts = ((factor, tAnchor) +: legs.map(l => (l._1, l._2)))
          .map { case (f, t) =>
            (math.log(f.toDouble), math.log(math.max(t, 1e-3))) }
        val n = pts.length.toDouble
        val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val expo = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        // per-adjacent-leg slopes (round-11 verdict item 1): the
        // global least-squares exponent can AVERAGE AWAY a convex
        // profile — a 0.6-then-1.6 pair of leg slopes fits at ~1.1
        // while the 30→100 tail is super-linear, which is exactly the
        // regime that kills a 100× scale-up. Each adjacent pair gets
        // its own log-log slope, emitted per leg, and the gate also
        // requires the MAX leg slope < 1.5.
        val rawPts = (factor, tAnchor) +: legs.map(l => (l._1, l._2))
        val legSlopes = rawPts.sliding(2).collect {
          case Seq((f1, t1), (f2, t2)) =>
            val sl = (math.log(math.max(t2, 1e-3)) -
              math.log(math.max(t1, 1e-3))) /
              (math.log(f2.toDouble) - math.log(f1.toDouble))
            (f1, f2, sl)
        }.toSeq
        val maxLegSlope =
          if (legSlopes.isEmpty) 0.0 else legSlopes.map(_._3).max
        // a non-monotonic fit is REJECTED regardless of its slope —
        // exp_ok asserts "sound evidence of sub-1.5 growth", and
        // corrupted legs are not evidence in either direction
        val expOk = expo < 1.5 && maxLegSlope < 1.5 && monotonic
        if (!expOk) bad += 1
        val slopeJson = legSlopes.map { case (f1, f2, sl) =>
          s""""slope_${f1}_${f2}":${f"$sl%.3f"}""" }.mkString(",")
        val legJson = legs.map { case (f, t, r, _) =>
          s""""t${f}_s":${f"$t%.3f"},"rows$f":$r""" }.mkString(",")
        val headroomJson =
          if (headroomLimited.isEmpty) ""
          else s""","headroom_limited":${headroomLimited.sorted
            .mkString("[", ",", "]")}"""
        emit(s"""{"query":"$name","t${factor}_s":${f"$tAnchor%.3f"},""" +
          s""""t${factor}_anchor_raw_s":${f"$tAnchorRaw%.3f"},""" +
          s""""t${factor}_suite_s":${f"$tN%.3f"},""" +
          (if (legJson.isEmpty) "" else legJson + ",") +
          s""""fit_factors":${(factor +: legs.map(_._1))
            .mkString("[", ",", "]")},""" +
          s""""monotonic":$monotonic,""" +
          (if (slopeJson.isEmpty) "" else slopeJson + ",") +
          s""""max_leg_slope":${f"$maxLegSlope%.3f"},""" +
          s""""growth_exponent":${f"$expo%.3f"},"exp_ok":$expOk""" +
          headroomJson + "}")
      }
      // drop the heavy dirs as soon as the phase ends — the 100× legs
      // of a LATER same-round run must not find this run's data still
      // occupying the disk (the r10 crash's root cause)
      heavyDirs.foreach { case (_, d) => deleteDir(d) }
    }
    // the exclusion ledger rides in the artifact even on filtered runs
    // (the full registry minus the full smoke list — a filtered `only`
    // run doesn't change what the smoke COVERS by design). Every entry
    // carries the measured sf0.1 wall where one exists, so the
    // below-threshold labels are auditable against the bench artifact
    // they were derived from.
    val fullLedger = ledger0 ++ ledgerExtra
    val exclJson = fullLedger.map { case (n, r, w) =>
      val wallJson = w.map(v => f""","wall_s":$v%.3f""").getOrElse("")
      s"""{"query":"$n","reason":"${r.replace("\"", "\\\"")}"$wallJson}"""
    }.mkString("[", ",", "]")
    emit(s"""{"metric":"scale_smoke_excluded","count":${
      fullLedger.length},"admit_threshold_s":$AdmitThresholdS,""" +
      s""""auto_admitted":${autoAdmitted.map("\"" + _ + "\"")
        .mkString("[", ",", "]")},"excluded":$exclJson}""")
    val worst = results.maxBy(_._2)
    emit(s"""{"metric":"scale_smoke","factor":$factor,""" +
      s""""queries":${results.length},"failures":$bad,""" +
      s""""worst_time_ratio":${f"${worst._2}%.2f"},""" +
      s""""worst_query":"${worst._1}"}""")
    // one committed JSON array per run (round-7 verdict item 2)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SMOKE_OUT",
      "SMOKE_FULL.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath),
      emitted.mkString("[\n", ",\n", "\n]\n"))
    catch { case e: Throwable =>
      System.err.println(s"[smoke] artifact write failed: ${e.getMessage}")
    }
    Seq(base, big, bigVec).foreach(deleteDir)
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
