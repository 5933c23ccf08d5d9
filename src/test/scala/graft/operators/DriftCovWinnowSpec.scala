package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-9 additions: winnowing fingerprints (locality
  * guarantee + rightmost-min selection), per-doc cross-entropy under
  * the corpus unigram LM (brute-force parity), and the quantized
  * embedding covariance (brute-force parity).
  */
class DriftCovWinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── Cohen's kappa ──────────────────────────────────────────────

  test("cohenKappa: hand-computed statistics and the degenerate pins") {
    // raters: a = (x,x,y,y), b = (x,y,y,y): n=4, agree=3,
    // marginals a: x=2,y=2; b: x=1,y=3 → Σ = 2·1 + 2·3 = 8
    // kappa = (4·3 − 8)/(16 − 8) = 0.5
    val df = Seq(("x", "x"), ("x", "y"), ("y", "y"), ("y", "y"))
      .toDF("a", "b")
    val out = Drift.cohenKappa(df, "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((4L, 3L, 8L, 500000000L)))
    // both raters constant and identical: chance agreement is total,
    // kappa undefined → pinned 0 (not 1, not NaN)
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Drift.cohenKappa(const, "a", "b")
      .as[(Long, Long, Long, Long)].head() == ((2L, 2L, 4L, 0L)))
    // empty input: all statistics 0, no NPE from null aggregates
    assert(Drift.cohenKappa(Seq.empty[(String, String)].toDF("a", "b"),
      "a", "b").as[(Long, Long, Long, Long)].head() ==
      ((0L, 0L, 0L, 0L)))
  }

  // ── unigram KL ─────────────────────────────────────────────────

  test("klUnigram: hand-computed smoothed KL on the nano grid, zero on identical slices") {
    def lnG(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9).toLong
    // slice a: tokens {x:2, y:1}, Na=3; slice b: {x:1, y:3}, Nb=4; V=2
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x y y y", "b"),
      (3L, "ignored", "c")) // third source: filtered out
      .toDF("doc_id", "text", "source")
    val sAb = 3L * (lnG(3 * 6) - lnG(2 * 5)) +
      2L * (lnG(2 * 6) - lnG(4 * 5))
    val sBa = 2L * (lnG(2 * 5) - lnG(3 * 6)) +
      4L * (lnG(4 * 5) - lnG(2 * 6))
    val out = TextAnalysis.klUnigram(docs, "text", "source", "a", "b")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((3L, 4L, 2L,
      math.floor(sAb.toDouble / 5.0).toLong,
      math.floor(sBa.toDouble / 6.0).toLong)))
    // identical slices: every term's two logs coincide → S = 0 exactly
    val same = Seq((1L, "x x y", "a"), (2L, "x x y", "b"))
      .toDF("doc_id", "text", "source")
    val z = TextAnalysis.klUnigram(same, "text", "source", "a", "b")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(z == ((3L, 3L, 2L, 0L, 0L)))
  }

  // ── winnowing ──────────────────────────────────────────────────

  test("winnowing: shared run of >= w+k-1 tokens guarantees a shared fp") {
    // k=4, w=4 ⇒ guarantee threshold is 7 shared tokens. Embed the
    // same 12-token run in two otherwise-different documents.
    val run = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    val docs = Seq(
      (1L, s"unrelated prefix words here $run and a different tail"),
      (2L, s"totally other opening $run closing differently now yes"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .select("id", "fp").as[(Long, Long)].collect().toSeq
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((a intersect b).nonEmpty,
      s"guaranteed shared fingerprint missing: $a vs $b")
  }

  test("winnowing: disjoint documents share no fingerprints") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "kk ll mm nn oo pp qq rr ss tt"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .select("id", "fp").as[(Long, Long)].collect().toSeq
    val a = fps.filter(_._1 == 1L).map(_._2).toSet
    val b = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((a intersect b).isEmpty)
  }

  test("winnowing: selection matches a brute-force rightmost-min model") {
    val text = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen"
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val (k, w) = (4, 4)
    // brute-force model: same hash (first 7 md5 nibbles), explicit
    // window scan with rightmost-min selection
    val toks = text.toLowerCase.trim.split("\\s+").toSeq
    val grams = toks.sliding(k).map(_.mkString(" ")).toSeq
    def h28(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      md.take(7).foldLeft(0L)((acc, c) =>
        acc * 16 + "0123456789abcdef".indexOf(c))
    }
    val hs = grams.map(h28)
    val want = (w - 1 until hs.length).flatMap { p =>
      val window = (p - w + 1 to p)
      // rightmost minimal: min by (hash asc, pos desc)
      val sel = window.minBy(q => (hs(q), -q))
      Some((hs(sel), sel.toLong))
    }.toSet
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k, w)
      .select("fp", "sel_pos").as[(Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("winnowing: a doc with fewer grams than w still fingerprints") {
    // 5 tokens ⇒ 2 grams < w=4: the whole-doc window must emit the min
    val docs = Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text")
      .collect()
    assert(fps.length == 1)
  }

  // ── cross-entropy ──────────────────────────────────────────────

  test("docCrossEntropy matches a brute-force unigram-LM model") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "rare words appear once"))
      .toDF("doc_id", "text")
    val all = Seq("the cat sat on the mat", "the dog sat",
      "rare words appear once").flatMap(_.split(" "))
    val n = all.size.toLong
    val cw = all.groupBy(identity).map { case (wd, xs) =>
      wd -> xs.size.toLong
    }
    def lpNano(wd: String): Long =
      math.floor(math.log(cw(wd).toDouble / n.toDouble) * 1e9).toLong
    val want = Seq(
      ("the cat sat on the mat", 1L), ("the dog sat", 2L),
      ("rare words appear once", 3L)).map { case (txt, id) =>
      val ts = txt.split(" ").toSeq
      val ce = -ts.groupBy(identity).map { case (wd, xs) =>
        xs.size.toLong * lpNano(wd)
      }.sum
      (id, ts.size.toLong, ce, ce / ts.size)
    }.toSet
    val got = TextAnalysis.docCrossEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_toks", "ce_sum_nano", "ce_per_tok_nano")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("docCrossEntropy: repeated boilerplate scores lower than rare text") {
    val docs = (1L to 9L).map(i => (i, "common common words repeat")) :+
      ((10L, "zyx wvu tsr qpo"))
    val out = TextAnalysis.docCrossEntropy(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .select("doc_id", "ce_per_tok_nano").as[(Long, Long)]
      .collect().toMap
    assert(out(10L) > out(1L),
      s"rare doc must score higher: ${out(10L)} vs ${out(1L)}")
  }

  // ── covariance ─────────────────────────────────────────────────

  test("embedCovariance matches a brute-force quantized model") {
    val vecs = Seq(
      Array(0.1f, -0.2f, 0.3f),
      Array(0.2f, 0.1f, -0.1f),
      Array(-0.3f, 0.25f, 0.05f),
      Array(0.15f, -0.05f, 0.2f))
    val df = vecs.map(Tuple1(_)).toDF("embedding")
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1e4).toLong))
    val nv = vecs.size
    val want = (for {
      i <- 0 until 3; j <- i until 3
    } yield {
      val sxy = q.map(r => r(i) * r(j)).sum
      val si = q.map(_(i)).sum
      val sj = q.map(_(j)).sum
      val cov = sxy.toDouble / (nv.toDouble * 1e8) -
        (si.toDouble / (nv.toDouble * 1e4)) *
          (sj.toDouble / (nv.toDouble * 1e4))
      (i, j, nv.toLong, math.floor(cov * 1e9).toLong)
    }).toSet
    val got = Similarity.embedCovariance(df, "embedding")
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("embedPcaExtremes converges on a strongly anisotropic corpus") {
    // variance along dim 0 dominates: v must align with axis 0 and
    // λ must approach the dim-0 variance
    val vecs = (0 until 200).map { r =>
      val main = (if (r % 2 == 0) 1.0f else -1.0f) * (0.5f + (r % 7) * 0.05f)
      Array(main, (r % 3 - 1) * 0.01f, (r % 5 - 2) * 0.01f)
    }
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val out = Similarity.embedPcaExtremes(df, "vec_id", "embedding",
      iters = 16, k = 5).collect()
    assert(out.length == 5)
    val lam = out.head.getAs[Long]("lambda_micro")
    val lamPrev = out.head.getAs[Long]("lambda_prev_micro")
    val trace = out.head.getAs[Long]("trace_nano")
    // dim-0 variance ≈ E[x²] ≈ 0.4265 (means cancel); dims 1-2 are
    // ~1e-4 — λ should capture nearly the whole trace
    assert(lam > 400000L && lam < 460000L, s"lambda_micro $lam")
    // converged: successive λ estimates within 1%
    assert(math.abs(lam - lamPrev) * 100 <= lam,
      s"not converged: $lamPrev -> $lam")
    assert(trace > (lam * 1000L * 95L) / 100L,
      s"trace $trace vs lambda $lam: top eig should dominate trace")
    // extremes: every returned doc sits at the positive max of the
    // dominant axis (main = +0.8); their exact order among equals is
    // decided by the tiny dim-1/2 components of the estimated
    // direction, so assert membership, not order
    val topIds = out.map(_.getLong(0)).toSeq
    assert(topIds.forall(id => vecs(id.toInt)(0) == 0.8f),
      s"top ids $topIds must all have main=+0.8")
  }

  // ── plan-shape gates (the .explain-and-iterate discipline): the
  // scale properties claimed in the scaladocs must be visible in the
  // physical plan, not asserted on trust ──

  test("plan: embedCovariance is one aggregate pass, no join, no explode") {
    val df = Seq(Array(0.1f, 0.2f), Array(0.3f, -0.1f)).map(Tuple1(_))
      .toDF("embedding")
    val plan = Similarity.embedCovariance(df, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"covariance must not join the data:\n$plan")
    // exactly ONE Generate (the inline), and it sits ABOVE the
    // aggregate (parents print first): the dim² expansion happens on
    // the 1-row aggregate output, never on the data
    assert("Generate".r.findAllIn(plan).size == 1 &&
      plan.indexOf("Generate") < plan.indexOf("ObjectHashAggregate"),
      s"the one inline must run on the aggregate output:\n$plan")
    assert(plan.contains("partial_gramagg"),
      s"GramAgg must run with map-side partials:\n$plan")
  }

  test("plan: winnowPairs carries no nested-loop join and one window pass") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val plan = Dedup.winnowPairs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"pairing must stay equi-join on fp:\n$plan")
    assert("Window".r.findAllIn(plan).size >= 1)
  }

  test("plan: docCrossEntropy reads only (doc_id, text) and broadcasts the total") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.docCrossEntropy(
      graft.Tables.load(spark, dir, "documents").select("doc_id", "text"),
      "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"column pruning must reach the scan:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"corpus total must broadcast as a HASH join (q_tpch_q11 " +
      s"discipline — no BNLJ):\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"no BNLJ in the scalar-broadcast path:\n$plan")
  }

  test("embedCovariance: diagonal is a nonnegative variance") {
    val df = Seq(Array(0.3f, -0.1f), Array(-0.2f, 0.4f),
      Array(0.1f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    val diag = Similarity.embedCovariance(df, "embedding")
      .filter("i = j").select("cov_nano").as[Long].collect()
    assert(diag.forall(_ >= -1L), s"variance must be ~nonnegative: " +
      diag.mkString(",")) // −1 allows one floor step below zero
  }
}
