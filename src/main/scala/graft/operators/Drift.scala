package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift primitives shared by the batch drift queries
  * (`q_psi_drift`'s binning + PSI formula) and the streaming monitor
  * ([[graft.streaming.Ingest.psiStream]]): fixed-width binning and a
  * Population-Stability-Index comparison of two binned count frames.
  *
  * Exactness discipline (the `q_psi_drift` / `q_keyness` micro-grid
  * rules): counts stay integer through the joins; the smoothed
  * probabilities are doubles built from identical integer inputs in
  * both engines; each bin's (pA−pB)·ln(pA/pB) term floors onto the
  * integer NANO grid BEFORE the cross-bin sum, so the total is
  * order-free and engine-exact.
  */
object Drift {
  /** Fixed-width histogram counts of `valueCol` per group:
    * (groupCol, bin, cnt), bin = min(nBins−1, ⌊value/binWidth⌋). One
    * map-side-combined aggregation — scan-local at any size.
    */
  def binCounts(df: DataFrame, groupCol: String, valueCol: String,
      binWidth: Double = 50.0, nBins: Int = 10): DataFrame =
    df.select(col(groupCol),
        least(lit(nBins - 1L), floor(col(valueCol) / binWidth))
          .as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))

  /** PSI per group between two [[binCounts]] frames — `a` the baseline
    * (typically a small persisted artifact), `b` the candidate. Bins
    * absent on one side count 0 (the full join) and Laplace smoothing
    * (+1 over n+nBins) keeps every log finite. Emits
    * (groupCol, n_a, n_b, psi_nano); the usual alarm line is
    * psi ≥ 0.2 ⇒ psi_nano ≥ 2e8.
    *
    * Scale shape: one full join on (group, bin) — both sides already
    * aggregated to ≤ groups·nBins rows — plus one rollup. The corpus
    * itself is only ever touched by [[binCounts]].
    */
  def psiNano(a: DataFrame, b: DataFrame, groupCol: String,
      nBins: Int = 10): DataFrame = {
    val j = a.select(col(groupCol), col("bin"), col("cnt").as("cnt_a"))
      .join(b.select(col(groupCol), col("bin"), col("cnt").as("cnt_b")),
        Seq(groupCol, "bin"), "full")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
    val tot = j.groupBy(groupCol)
      .agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    j.join(tot, groupCol)
      .withColumn("pa",
        (col("cnt_a") + 1L).cast("double") /
          (col("n_a") + nBins.toLong).cast("double"))
      .withColumn("pb",
        (col("cnt_b") + 1L).cast("double") /
          (col("n_b") + nBins.toLong).cast("double"))
      .withColumn("term_nano",
        floor((col("pa") - col("pb")) * log(col("pa") / col("pb")) *
          lit(1000000000.0)).cast("long"))
      .groupBy(groupCol)
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("term_nano")).as("psi_nano"))
  }

  /** COHEN'S KAPPA between two categorical label columns — the
    * chance-corrected agreement score labeling pipelines use to audit
    * annotator (or metadata-vs-classifier) consistency; raw agreement
    * flatters any skewed label distribution, kappa doesn't. The three
    * sufficient statistics are exact int64 aggregates (n, agreements,
    * Σ_k marginal_a(k)·marginal_b(k)); kappa = (n·agree − Σ)/(n² − Σ)
    * derives from them in ONE fixed-order double expression, so both
    * engines match bit-for-bit. n² − Σ = 0 (both raters constant and
    * identical — chance agreement is total, kappa undefined) pins 0.
    *
    * Returns one row: (n, n_agree, sum_marg_prod, kappa_nano).
    * Scale shape: one scan for the pair counts, two map-side-combined
    * marginal aggregates joined on the (tiny) class domain, three
    * 1-row collects — nothing grows past the class count.
    */
  /** SPEARMAN RANK CORRELATION between two numeric columns — the
    * monotone-association read that Pearson misses when the relation
    * is nonlinear (doc length vs quality, activity vs spend): rank
    * both columns, Pearson on the ranks. Ties take the average rank,
    * kept INTEGER by doubling: 2·avgrank = 2·minrank + ties − 1, so
    * the five moment sums are exact int64 and rho is ONE fixed-order
    * double expression both engines replay bit-for-bit (the
    * q_corr_matrix discipline). Degenerate variance pins NULL→0 via
    * the same vx>0 ∧ vy>0 guard. Returns one row (n, rho_nano).
    *
    * Scale shape: two [[Ranks.doubledRanks]] value histograms (the
    * corpus is scanned once per axis, everything after is |distinct
    * value| — no single-task global window anywhere), two hash joins
    * back on the value, one map-side-combined moment aggregate. Int64
    * headroom: Σ(2r)² ≈ 4n³ — exact to n ≈ 10⁶ entities; past that,
    * pre-aggregate coarser or bucket the axes first.
    */
  def spearmanNano(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    // NULL rows carry no rank information and are excluded UP FRONT
    // (round-11 advice: leaving them in the value histogram inflates
    // every other value's cumulative rank while the join back then
    // drops the null rows — ranks over the retained rows would no
    // longer be 1..m; the oracle mirrors this filter)
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    val rx = Ranks.doubledRanks(base, "x")
      .select(col("v").as("x"), col("r2").as("rx"))
    val ry = Ranks.doubledRanks(base, "y")
      .select(col("v").as("y"), col("r2").as("ry"))
    val m = base.join(rx, "x").join(ry, "y")
      .agg(count(lit(1)).as("n"),
        sum("rx").as("sx"), sum(col("rx") * col("rx")).as("sxx"),
        sum("ry").as("sy"), sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
    val nD = col("n").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("n"),
      coalesce(when(vx > 0.0 && vy > 0.0,
        floor((nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt(vx * vy) * lit(1e9)).cast("long")), lit(0L))
        .as("rho_nano"))
  }

  /** MANN–WHITNEY U between two slices of a numeric column — the
    * rank-sum test statistic (distribution-free: is slice A
    * stochastically longer/larger than slice B?), plus the
    * common-language effect size U/(n_a·n_b) = P(a > b) + ½P(a = b),
    * the probability read reviewers actually want. Ranks over the
    * COMBINED order with doubled average ranks (exact ints under
    * ties, as [[spearmanNano]]); 2U_a = 2R_a − n_a(n_a+1) stays
    * integer; the effect size is one IEEE floor-division. Returns one
    * row (n_a, n_b, u2_a, cles_nano).
    *
    * Scale shape: sufficient statistics live entirely on the VALUE
    * HISTOGRAM — per distinct v, its multiplicity and its slice-a
    * share; one [[Ranks.globalPrefix]] turns those into doubled ranks
    * (2R_a = Σ_v ca(v)·r2(v)), then one moment aggregate. The corpus
    * is scanned once; no per-row rank join, no single-task window.
    */
  def mannWhitneyNano(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame = {
    // NULL measurements rank nowhere — excluded, as in [[spearmanNano]]
    val hist = df.filter(col(groupCol).isin(a, b) &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("v")
      .agg(count(lit(1)).as("c"),
        coalesce(sum(when(col("g") === a, 1L).otherwise(0L)), lit(0L))
          .as("ca"))
    Ranks.globalPrefix(hist, Seq("v"), "c", "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("c") + 1L)
      .agg(
        coalesce(sum(col("ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("c") - col("ca")), lit(0L)).as("n_b"),
        coalesce(sum(col("ca") * col("r2")), lit(0L)).as("r2_a"))
      .select(col("n_a"), col("n_b"),
        (col("r2_a") - col("n_a") * (col("n_a") + 1L)).as("u2_a"))
      .select(col("n_a"), col("n_b"), col("u2_a"),
        coalesce(when(col("n_a") > 0L && col("n_b") > 0L,
          floor(col("u2_a").cast("double") /
            (lit(2.0) * col("n_a").cast("double") *
              col("n_b").cast("double")) * lit(1e9)).cast("long")),
          lit(0L)).as("cles_nano"))
  }

  /** GINI COEFFICIENT of a non-negative integer mass column — the
    * concentration audit for corpus balance (token mass per domain,
    * spend per user, docs per source): 0 = perfectly even, →1 = one
    * entity holds everything. Exact discrete form over the ascending
    * sort x₁..xₙ: G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ); equal values
    * permute freely (equal x ⇒ identical contribution), so the
    * statistic is order-canonical: a value of multiplicity c at
    * minrank m contributes v·(c·m + c(c−1)/2) — which is why `idCol`
    * only exists for the ORACLE's row_number determinism; the engine
    * computes Σi·xᵢ from the value histogram without ever ordering
    * rows. Numerator/denominator stay int64; the ratio is one IEEE
    * floor to nano. Returns one row (n, total, gini_nano); zero total
    * pins 0.
    *
    * Scale shape: one histogram aggregation + one
    * [[Ranks.globalPrefix]] over |distinct v| rows + one moment
    * aggregate — no single-task window, no per-row sort. Int64/double
    * headroom: Σi·xᵢ ≤ n·total < 2⁵³ — holds to ~10⁶ entities × 10⁹
    * mass.
    */
  def giniNano(df: DataFrame, idCol: String,
      valueCol: String): DataFrame = {
    require(df.columns.contains(idCol), s"no column $idCol")
    // NULL masses hold no share of the distribution — excluded, as in
    // [[spearmanNano]] (the oracle mirrors the filter)
    val hist = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("c"))
    val m = Ranks.globalPrefix(hist, Seq("v"), "c", "cum")
      .select(col("v"), col("c"),
        (col("v") * (col("c") * (col("cum") - col("c") + 1L) +
          expr("c * (c - 1L) div 2"))).as("t"))
      .agg(coalesce(sum("c"), lit(0L)).as("n"),
        coalesce(sum(col("v") * col("c")), lit(0L)).as("total"),
        coalesce(sum("t"), lit(0L)).as("s1"))
    m.select(col("n"), col("total"),
      coalesce(when(col("total") > 0L,
        floor((lit(2.0) * col("s1").cast("double") -
          (col("n") + 1L).cast("double") * col("total").cast("double")) /
          (col("n").cast("double") * col("total").cast("double")) *
          lit(1e9)).cast("long")), lit(0L)).as("gini_nano"))
  }

  /** THEIL T INDEX of a non-negative integer mass column — the
    * inequality read that, unlike [[giniNano]], DECOMPOSES: corpus
    * inequality = between-group + within-group, so a mix planner can
    * attribute concentration to domains vs documents. T =
    * (1/X)·Σ x·ln(x·n/X) (0 = even, ln n = one entity holds all).
    * Exactness (the klUnigram discipline, MICRO grid for headroom):
    * each positive x contributes x·(⌊ln(x·n)·1e6⌋ − ⌊ln X·1e6⌋) to an
    * order-free int64 sum; theil_micro = ⌊S/X⌋ via one IEEE floor.
    * Zero-mass entities contribute 0 (the x·ln x limit) but count in
    * n. Int64 headroom: |S| ≤ X·ln(n)·1e6 — fine through X ≈ 10¹¹.
    * Returns one row (n, total, theil_micro); zero total pins 0.
    *
    * Scale shape: two scans of the (pre-aggregated) entity frame and
    * two 1-row broadcasts — no window, no sort, no join by key.
    */
  def theilIndex(df: DataFrame, valueCol: String): DataFrame = {
    def lnG6(x: Column): Column =
      floor(log(x.cast("double")) * 1e6).cast("long")
    val a = df.select(col(valueCol).cast("long").as("x"))
    val tot = a.agg(count(lit(1)).as("n"),
      coalesce(sum("x"), lit(0L)).as("total"))
    val s = a.filter(col("x") > 0L).crossJoin(broadcast(tot))
      .select((col("x") *
        (lnG6(col("x") * col("n")) - lnG6(col("total")))).as("t"))
      .agg(coalesce(sum("t"), lit(0L)).as("s"))
    tot.crossJoin(broadcast(s))
      .select(col("n"), col("total"),
        coalesce(when(col("total") > 0L,
          floor(col("s").cast("double") / col("total").cast("double"))
            .cast("long")), lit(0L)).as("theil_micro"))
  }

  /** MUTUAL INFORMATION between two categorical columns — the
    * feature-audit statistic (how much does knowing the slice tell
    * you about the label?) that chi² significance and per-pair PMI
    * don't summarize: MI = Σ_cells p(x,y)·ln(p(x,y)/(p(x)p(y))).
    * Exactness (the q_keyness / klUnigram discipline): cell and
    * marginal counts stay int64; each cell's ln(c_xy·n) and
    * ln(c_x·c_y) floor onto the NANO grid BEFORE the weighted
    * order-free int sum S = Σ c_xy·(lnA − lnB); mi_nano = ⌊S/n⌋ via
    * one IEEE floor-division (cells can sit below 0 on the grid, so
    * no truncating int div). Returns one row (n, n_cells, mi_nano).
    *
    * Scale shape: one pair-count aggregation (map-side combined) plus
    * two marginal joins on the tiny class domains — nothing grows
    * past |X|·|Y| cells after the scan.
    */
  def mutualInfoNano(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    def lnGrid(x: Column): Column =
      floor(log(x.cast("double")) * 1e9).cast("long")
    val pairs = df.select(col(aCol).as("a"), col(bCol).as("b"))
    // cells appears four times in the DAG; like [[klUnigram]]'s vocab
    // join it stays un-persisted — each branch is one map-side-combined
    // aggregation over the |X|·|Y|-bounded cell table, not the corpus
    val cells = pairs.groupBy("a", "b").agg(count(lit(1)).as("c"))
    val ma = cells.groupBy("a").agg(sum("c").as("ca"))
    val mb = cells.groupBy("b").agg(sum("c").as("cb"))
    val tot = cells.agg(coalesce(sum("c"), lit(0L)).as("n"),
      count(lit(1)).as("n_cells"))
    cells.join(ma, "a").join(mb, "b")
      .crossJoin(broadcast(tot))
      .withColumn("t", col("c") *
        (lnGrid(col("c") * col("n")) - lnGrid(col("ca") * col("cb"))))
      .agg(max("n").as("n"), max("n_cells").as("n_cells"),
        coalesce(sum("t"), lit(0L)).as("s"))
      .select(col("n"), col("n_cells"),
        coalesce(when(col("n") > 0L,
          floor(col("s").cast("double") / col("n").cast("double"))
            .cast("long")), lit(0L)).as("mi_nano"))
  }

  def cohenKappa(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val pairs = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val head = pairs.agg(count(lit(1)).as("n"),
      coalesce(sum(when(col("a") === col("b"), 1L).otherwise(0L)),
        lit(0L)).as("ag")).head()
    val (n, agree) = (head.getLong(0), head.getLong(1))
    val margRow = pairs.groupBy("a").agg(count(lit(1)).as("ca"))
      .join(pairs.groupBy("b").agg(count(lit(1)).as("cb"))
        .withColumnRenamed("b", "a"), "a")
      .agg(sum(col("ca") * col("cb"))).head()
    val marg = if (margRow.isNullAt(0)) 0L else margRow.getLong(0)
    pairs.unpersist()
    val den = n * n - marg
    val kappaNano =
      if (den == 0L) 0L
      else math.floor((n * agree - marg).toDouble / den.toDouble
        * 1e9).toLong
    import org.apache.spark.sql.types.{StructType, StructField, LongType}
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(n, agree, marg, kappaNano)),
      StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("n_agree", LongType, nullable = false),
        StructField("sum_marg_prod", LongType, nullable = false),
        StructField("kappa_nano", LongType, nullable = false))))
  }

  /** KRUSKAL–WALLIS H across k slices of a numeric column — the
    * k-group generalization of [[mannWhitneyNano]] (distribution-free
    * "do these sources draw from the same length/quality
    * distribution?", the first test a corpus audit reaches for when
    * there are more than two slices). Doubled average ranks keep the
    * rank sums exact int64: with S2_g = Σ_g 2·avgrank,
    * H = 3/(n(n+1)) · Σ_g S2_g²/n_g − 3(n+1); the tie correction
    * divides by 1 − Σ_v(c³−c)/(n³−n).
    *
    * Exactness: per-group terms ⌊S2_g²/n_g⌋ are one fixed-order IEEE
    * floor each (S2_g² leaves int64 near n ≈ 4·10⁴ rows, so the
    * square runs in double — deterministic, both engines write the
    * identical three-op expression), then an exact int64 sum; H and
    * its tie-corrected form are one double floor each at the edge.
    * The tie sum Σ(c³−c) stays pure int64. NULL measurements are
    * excluded up front ([[spearmanNano]]'s rule; oracle mirrors).
    * All-tied input (tie correction denominator 0) pins h_tie_nano 0.
    *
    * Returns one row: (n, n_groups, tie_sum, h_nano, h_tie_nano).
    * Scale shape: one (group, value) count aggregation, one value
    * histogram + [[Ranks.globalPrefix]] over |distinct v| rows, one
    * per-group moment aggregate (k rows), one 1-row reduce — the
    * corpus is scanned once, nothing downstream grows past
    * |distinct v| + k.
    */
  def kruskalWallisNano(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val gv = df.filter(col(valueCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("g", "v").agg(count(lit(1)).as("cg"))
    val hist = gv.groupBy("v").agg(sum("cg").as("c"))
    val ranked = Ranks.globalPrefix(hist, Seq("v"), "c", "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("c") + 1L)
    val perG = gv.join(ranked.select("v", "r2"), "v")
      .groupBy("g")
      .agg(sum("cg").as("ng"), sum(col("cg") * col("r2")).as("s2"))
      .select(col("ng"),
        floor(col("s2").cast("double") * col("s2").cast("double") /
          col("ng").cast("double")).cast("long").as("term"))
    val ties = ranked.agg(coalesce(
      sum(col("c") * col("c") * col("c") - col("c")), lit(0L))
      .as("tie_sum"))
    val m = perG.agg(coalesce(sum("ng"), lit(0L)).as("n"),
        count(lit(1)).as("n_groups"),
        coalesce(sum("term"), lit(0L)).as("s"))
      .crossJoin(broadcast(ties))
    val nD = col("n").cast("double")
    val hRaw = lit(3.0) * col("s").cast("double") /
      (nD * (nD + 1.0)) - lit(3.0) * (nD + 1.0)
    val tieDen = lit(1.0) - col("tie_sum").cast("double") /
      (nD * nD * nD - nD)
    m.select(col("n"), col("n_groups"), col("tie_sum"),
      coalesce(when(col("n") > 1L,
        floor(hRaw * 1e9).cast("long")), lit(0L)).as("h_nano"),
      coalesce(when(col("n") > 1L && tieDen > 0.0,
        floor(hRaw / tieDen * 1e9).cast("long")), lit(0L))
        .as("h_tie_nano"))
  }

  /** CRAMÉR'S V between two categorical columns — the [0, 1]-bounded
    * strength-of-association read the raw chi² statistic (which grows
    * with n) and [[mutualInfoNano]] (which grows with entropy) don't
    * give: V = √(χ²/(n·(min(r,c)−1))), comparable across tables of
    * any size — the "is lang confounded with source" audit number.
    *
    * Exactness: the contingency cells, row/column marginals, n, r, c
    * are exact int64. χ² uses the identity Σ(o−e)²/e = Σ o²/e − n,
    * under which EMPTY cells contribute exactly zero — so the sum
    * runs over observed cells only, with no r×c grid to materialize
    * (the naive (o−e)²/e form silently drops the zero-cell mass).
    * Each observed cell's o²·n/(r_a·c_b) floors onto the MICRO grid
    * as one fixed-order IEEE expression (the products leave int64
    * past n ≈ 10⁵, so they run in double — both engines write the
    * same op sequence), then an exact int64 sum minus n·1e6; V is one
    * double sqrt+floor at the edge. Degenerate tables (one row or one
    * column class — min(r,c) = 1, association undefined) pin 0, as
    * does a floor-error-negative χ² on an independent table.
    *
    * Returns one row: (n, r, c, chi2_micro, v_nano). Scale shape: one
    * (a, b) cell count, two marginal aggregates joined back on the
    * (tiny) class domains, a 1-row broadcast, one reduce — nothing
    * grows past the observed-cell count after the scan.
    */
  def cramersVNano(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val ra = cells.groupBy("a").agg(sum("o").as("ra"))
    val cb = cells.groupBy("b").agg(sum("o").as("cb"))
    val tot = cells.agg(coalesce(sum("o"), lit(0L)).as("n"),
      countDistinct("a").as("r"), countDistinct("b").as("c"))
    val terms = cells.join(ra, "a").join(cb, "b")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        floor(col("o").cast("double") * col("o").cast("double") *
          col("n").cast("double") /
          (col("ra").cast("double") * col("cb").cast("double")) * 1e6)
          .cast("long").as("t"))
    terms.groupBy("n", "r", "c")
      .agg(coalesce(sum("t"), lit(0L)).as("s"))
      .select(col("n"), col("r"), col("c"),
        (col("s") - col("n") * 1000000L).as("chi2_micro"))
      .select(col("n"), col("r"), col("c"), col("chi2_micro"),
        coalesce(when(col("n") > 0L && least(col("r"), col("c")) > 1L &&
            col("chi2_micro") > 0L,
          floor(sqrt(col("chi2_micro").cast("double") / 1e6 /
            (col("n").cast("double") *
              (least(col("r"), col("c")) - 1L).cast("double"))) * 1e9)
            .cast("long")), lit(0L)).as("v_nano"))
  }

  /** KENDALL'S TAU-B over a BUCKETIZED joint distribution — the
    * concordance-based rank correlation peer of [[spearmanNano]]
    * (tau reads P(concordant) − P(discordant); rho reads the linear
    * fit of the ranks — reviewers want both because tau is the one
    * with the clean probabilistic interpretation under heavy ties).
    * `xCol`/`yCol` must already be integer bucket ids in
    * [0, bx) × [0, by) — tau on bucketized data is GROUPED tau, the
    * standard form for histogram-shaped corpus audits.
    *
    * The naive formulation enumerates all n² point pairs (or all k²
    * histogram-cell pairs via an inequality join — a nested-loop
    * plan). Neither survives scale. Instead the concordant/discordant
    * counts come from a 2D PREFIX SUM on the dense bx×by grid, via
    * the per-point identity
    *
    *   C − D = Σ_p (2·Lxy(p) + Txy(p) − Lx(p))
    *
    * where Lxy = #{x′<x ∧ y′<y}, Txy = #{x′<x ∧ y′=y}, Lx = #{x′<x}
    * (each concordant pair is counted once at its dominant point:
    * C = Σ_p Lxy; D = Σ_p (Lx − Lxy − Txy) because a strictly-left
    * partner is concordant, discordant, or y-tied — nothing else).
    * Lxy is two bounded-partition window passes on the grid (strict
    * y-prefix within each x column, then strict x-prefix of those
    * within each y row — ≤ max(bx, by) rows per task, never a global
    * window); Lx is one [[Ranks.globalPrefix]] over the bx-row x
    * marginal. Tie pairs n1/n2 come from the marginals; the
    * denominator √((n0−n1)(n0−n2)) is the single IEEE expression at
    * the edge.
    *
    * Scale shape: one map-side-combined aggregation over the corpus →
    * ≤ bx·by cells; everything after is grid-sized (≤ 65 536 rows by
    * the `require`). C, D stay exact int64 to n ≈ 3·10⁹ points
    * (C ≤ n²/2 < 2⁶³). Returns one row (n, conc, disc, tie_x_pairs,
    * tie_y_pairs, tau_b_nano); a denominator with no untied pairs
    * pins tau_b_nano to 0.
    */
  def kendallTauNano(df: DataFrame, xCol: String, yCol: String,
      bx: Int, by: Int): DataFrame = {
    require(bx > 0 && by > 0 && bx.toLong * by <= 65536L,
      s"bucket grid ${bx}x$by exceeds the 65536-cell bound")
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    val cells = base.groupBy("x", "y").agg(count(lit(1)).as("c"))
    // dense grid from LITERAL bucket counts — no crossJoin of data-
    // derived relations, so the registry's cartesian gate stays clean
    val grid = df.sparkSession.range(bx.toLong * by)
      .select(expr(s"id div $by").as("x"), expr(s"id % $by").as("y"))
    val g = grid.join(cells, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("c"), lit(0L)).as("c"))
    val wY = Window.partitionBy("x").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wX = Window.partitionBy("y").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = g
      .withColumn("cylt", coalesce(sum("c").over(wY), lit(0L)))
      .withColumn("lxy", coalesce(sum("cylt").over(wX), lit(0L)))
      .withColumn("txy", coalesce(sum("c").over(wX), lit(0L)))
    val tx = g.groupBy("x").agg(sum("c").as("t"))
    val ty = g.groupBy("y").agg(sum("c").as("t"))
    val lx = Ranks.globalPrefix(tx, Seq("x"), "t", "cum")
      .select(col("x"), (col("cum") - col("t")).as("lxv"))
    val cd = pre.join(broadcast(lx), "x")
      .agg(coalesce(sum(col("c") * col("lxy")), lit(0L)).as("conc"),
        coalesce(sum(col("c") *
          (col("lxv") - col("lxy") - col("txy"))), lit(0L)).as("disc"))
    val tiex = tx.agg(coalesce(sum("t"), lit(0L)).as("n"),
      coalesce(sum(expr("t * (t - 1) div 2")), lit(0L))
        .as("tie_x_pairs"))
    val tiey = ty.agg(coalesce(sum(expr("t * (t - 1) div 2")), lit(0L))
      .as("tie_y_pairs"))
    cd.crossJoin(broadcast(tiex)).crossJoin(broadcast(tiey))
      .withColumn("dx", expr("n * (n - 1) div 2") - col("tie_x_pairs"))
      .withColumn("dy", expr("n * (n - 1) div 2") - col("tie_y_pairs"))
      .select(col("n"), col("conc"), col("disc"), col("tie_x_pairs"),
        col("tie_y_pairs"),
        coalesce(when(col("dx") > 0L && col("dy") > 0L,
          floor((col("conc") - col("disc")).cast("double") /
            sqrt(col("dx").cast("double") * col("dy").cast("double")) *
            lit(1e9)).cast("long")), lit(0L)).as("tau_b_nano"))
  }

  /** ONE-WAY ANOVA F — the parametric peer of [[kruskalWallisNano]]
    * (same question, "do the k groups share a mean", answered through
    * variances instead of ranks; audits report both because F is the
    * one with classical power under near-normal spend/length
    * columns). Per-group integer moments (ng, Σv, Σv²) are one
    * map-side-combined aggregation; each group's Sg²/ng lands as ONE
    * fixed-order IEEE term floored to the UNIT grid before the exact
    * int sum (the [[kruskalWallisNano]] discipline — order-free and
    * engine-exact, off at most 1 per group from the real-valued sum,
    * negligible against n-scaled squares). SSB = Σ⌊Sg²/ng⌋ − ⌊T²/n⌋,
    * SSW = Σv² − Σ⌊Sg²/ng⌋; F is the single IEEE edge expression.
    * Returns one row (n, n_groups, ssb, ssw, f_nano); degenerate
    * inputs (k ≤ 1, n ≤ k, SSW ≤ 0) pin f_nano to 0.
    *
    * Scale shape: one aggregation over the corpus → k rows → one
    * 1-row fold. Int64 headroom: Σv² ≤ n·max(v)² — exact to 10⁹ rows
    * of ~3·10⁴-magnitude values; past that, pre-scale the column.
    */
  def anovaFNano(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val e = df.filter(col(groupCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val pg = e.groupBy("g").agg(count(lit(1)).as("ng"),
      sum("v").as("sg"), sum(col("v") * col("v")).as("qg"))
    val t = pg.select(col("ng"), col("qg"), col("sg"),
      floor(col("sg").cast("double") * col("sg").cast("double") /
        col("ng").cast("double")).cast("long").as("term"))
    t.agg(coalesce(sum("ng"), lit(0L)).as("n"),
        count(lit(1)).as("n_groups"),
        coalesce(sum("term"), lit(0L)).as("s"),
        coalesce(sum("qg"), lit(0L)).as("q"),
        coalesce(sum("sg"), lit(0L)).as("tt"))
      .select(col("n"), col("n_groups"),
        (col("s") - floor(col("tt").cast("double") *
          col("tt").cast("double") / col("n").cast("double"))
          .cast("long")).as("ssb"),
        (col("q") - col("s")).as("ssw"))
      .select(col("n"), col("n_groups"), col("ssb"), col("ssw"),
        coalesce(when(col("n") > col("n_groups") &&
            col("n_groups") > 1L && col("ssw") > 0L,
          floor((col("ssb").cast("double") /
              (col("n_groups") - 1L).cast("double")) /
            (col("ssw").cast("double") /
              (col("n") - col("n_groups")).cast("double")) *
            lit(1e9)).cast("long")), lit(0L)).as("f_nano"))
  }

  /** WILCOXON SIGNED-RANK W⁺ over a PAIRED integer difference column
    * — the matched-pairs member of the rank-test family
    * ([[mannWhitneyNano]] compares two independent slices; this one
    * asks "did the SAME entities shift", the before/after question of
    * drift audits). Standard Wilcoxon discards zero differences; the
    * survivors' |d| get doubled average ranks (exact ints under ties,
    * the [[spearmanNano]] convention) and W⁺ sums the ranks of the
    * positive side — reported doubled (`w2_plus` = 2·W⁺, exact), plus
    * the normalized location read w_frac = W⁺ / (n(n+1)/2) ∈ [0, 1]
    * (½ = symmetric shifts, 1 = every pair shifted up) as the one
    * IEEE floor at the edge. Returns one row
    * (n, w2_plus, w_frac_nano); n counts the NONZERO pairs.
    *
    * Scale shape, exactly [[mannWhitneyNano]]: sufficient statistics
    * live on the |d| VALUE HISTOGRAM (per distinct |d|: multiplicity
    * and positive share), one [[Ranks.globalPrefix]] turns those into
    * doubled ranks, one moment aggregate folds them — the pair table
    * is scanned once, no per-row rank join, no single-task window.
    */
  def wilcoxonNano(df: DataFrame, diffCol: String): DataFrame = {
    val nz = df.filter(col(diffCol).isNotNull &&
        col(diffCol).cast("long") =!= 0L)
      .select(abs(col(diffCol).cast("long")).as("v"),
        when(col(diffCol).cast("long") > 0L, 1L).otherwise(0L)
          .as("pos"))
    val h = nz.groupBy("v").agg(count(lit(1)).as("c"),
      sum("pos").as("cpos"))
    Ranks.globalPrefix(h, Seq("v"), "c", "cum")
      .withColumn("r2", lit(2L) * col("cum") - col("c") + 1L)
      .agg(coalesce(sum("c"), lit(0L)).as("n"),
        coalesce(sum(col("cpos") * col("r2")), lit(0L)).as("w2_plus"))
      .select(col("n"), col("w2_plus"),
        coalesce(when(col("n") > 0L,
          floor(col("w2_plus").cast("double") /
            (col("n").cast("double") *
              (col("n") + 1L).cast("double")) *
            lit(1e9)).cast("long")), lit(0L)).as("w_frac_nano"))
  }
}
