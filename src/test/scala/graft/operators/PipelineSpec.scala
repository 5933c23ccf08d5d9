package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = graft.Tables.load(spark, sf, "documents")
    .select("doc_id", "text")

  test("minhash LSH finds the pairs exact jaccard finds (high thresholds)") {
    val aug = docs.limit(100).union(docs.limit(100).selectExpr(
      "doc_id + 100000 AS doc_id", "concat(text, ' zz') AS text"))
    val exact = Dedup.ngramJaccard(aug, "doc_id", "text", n = 5,
        threshold = 0.5, maxDocFreq = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLSH(aug, "doc_id", "text", shingleSize = 5,
        numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification stage makes LSH ⊆ exact; banding at 16 bands/4 rows
    // catches j≥0.5 pairs with prob ≥ 1-(1-0.5^4)^16 ≈ 0.65 per pair —
    // mutated twins have j≈0.9 (prob ≈ 1-(1-0.9^4)^16 ≈ 1-2e-8)
    assert(lsh.subsetOf(exact))
    val twins = exact.filter { case (a, b) => b == a + 100000 }
    assert(twins.nonEmpty && twins.subsetOf(lsh),
      "high-similarity twins must survive LSH banding")
  }

  test("incremental minhash: twins match index, novel docs don't, corpus broadcast-joined") {
    val corpus = docs.filter("doc_id < 100")
    val path = java.nio.file.Files
      .createTempDirectory("graft-mhinc").toString
    Dedup.minhashIndexWrite(corpus, "doc_id", "text", path)
    assert(new java.io.File(path + "/buckets").exists() &&
      new java.io.File(path + "/shingles").exists())
    // increment: mutated twins of docs 0-9 plus genuinely novel docs
    // (corpus docs 200-209 are NOT in the index, which covers < 100)
    val inc = docs.filter("doc_id < 10").selectExpr(
        "doc_id + 100000 AS doc_id", "concat(text, ' zz') AS text")
      .union(docs.filter("doc_id >= 200 AND doc_id < 210").selectExpr(
        "doc_id + 200000 AS doc_id", "text"))
    val got = Dedup.minhashDedupIncremental(inc, "doc_id", "text", path,
      threshold = 0.5)
    // the new side is broadcast — the corpus-side index scan must not
    // shuffle for candidate generation
    assert(got.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "bucket probe must broadcast the increment")
    val pairs = got.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every twin matches its original at high jaccard
    val twinMatches = pairs.filter { case (n, o, _) => n == o + 100000 }
    assert(twinMatches.length == 10, s"expected 10 twin matches, got: ${pairs.toSeq}")
    assert(twinMatches.forall(_._3 >= 0.5))
    // incremental pairs ⊆ the exact cross-pair set over the union
    val exact = Dedup.ngramJaccard(corpus.union(inc), "doc_id", "text",
        n = 5, threshold = 0.5, maxDocFreq = 0)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet.subsetOf(exact))
    // novel docs (ids >= 200000) must not match anything
    assert(!pairs.exists(_._1 >= 200000L))
  }

  test("paragraph dedup: shared boilerplate survives only in its first doc") {
    val fixture = Seq(
      (1L, "unique one. subscribe now. more text one"),
      (2L, "unique two. subscribe now. more text two"),
      (3L, "Subscribe   NOW. totally fresh")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(fixture, "doc_id", "text")
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L), (2L, 3L, 2L), (3L, 2L, 1L)))
    // doc 1 keeps the boilerplate (first occurrence); docs 2 and 3 lose
    // it — doc 3 via the NORMALIZED match (case + whitespace)
    assert(out(0).getString(3) == "unique one. subscribe now. more text one")
    assert(out(1).getString(3) == "unique two. more text two")
    assert(out(2).getString(3) == "totally fresh")
  }

  test("connected components: chains, stars, and deep paths collapse to min labels") {
    // chain 1-2-3 (needs a propagation round), pair 10-11, star around
    // 20, reversed pair 31-30, and a diameter-4 path 40..44 (forces
    // several rounds before the fixpoint certification)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (20L, 22L), (20L, 23L), (31L, 30L), (40L, 41L), (41L, 42L),
      (42L, 43L), (43L, 44L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L,
      30L -> 30L, 31L -> 30L,
      40L -> 40L, 41L -> 40L, 42L -> 40L, 43L -> 40L, 44L -> 40L)
    assert(comp == expect, comp.toSeq.sorted.mkString(";"))
  }

  test("paragraph dedup matches an in-memory first-occurrence model on random corpora") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "shared",
      "footer", "one", "two")
    (0 until 3).foreach { _ =>
      val fixture = (0L until 12L).map { id =>
        val paras = Seq.fill(1 + rnd.nextInt(4))(
          Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
            .mkString(" "))
        (id, paras.mkString(". "))
      }
      val norm = (s: String) => s.trim.toLowerCase.replaceAll("\\s+", " ")
      val seen = scala.collection.mutable.Set[String]()
      val model = fixture.map { case (id, text) =>
        val ps = text.split("\\. ", -1)
        val kept = ps.filter(p => seen.add(norm(p)))
        (id, ps.length.toLong, kept.length.toLong, kept.mkString(". "))
      }
      val got = Dedup.paragraphDedup(fixture.toDF("doc_id", "text"),
          "doc_id", "text")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got.toSeq == model)
    }
  }

  test("curate: keeps clean english, drops junk/foreign, dedups, redacts") {
    val fixture = Seq(
      (1L, "The cat sat on the mat and it was a good day for the town to gather."),
      (2L, "The cat sat on the mat and it was a good day for the town to gather."),
      (3L, "der hund ist nicht zu hause und ich bin mit der katze im garten"),
      (4L, "1234567890 9876543210 0000000 111111 22222 3333 the of and to"),
      (5L, "Write to the editor at tips@news.example.com for all of the details " +
        "about the show and the time it starts.")).toDF("doc_id", "text")
    val out = Curate.curate(fixture, "doc_id", "text",
      keepLangs = Seq("en"), minQuality = 0.5).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 5L),
      s"got ${out.map(_.getLong(0)).toSeq}") // 2 deduped, 3 german, 4 junk
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Long]("n_copies") == 2L)
    assert(byId(5L).getAs[Long]("n_copies") == 1L)
    assert(byId(5L).getAs[Int]("n_emails") == 1)
    assert(byId(5L).getAs[String]("redacted").contains("<EMAIL>") &&
      !byId(5L).getAs[String]("redacted").contains("tips@"))
    // one exchange for the dedup window; filters run before it
    val plan = Curate.curate(fixture, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("decontaminate finds benchmark quotes, skips clean docs, broadcasts bench") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "nothing in common with anything else at all here now")).toDF("doc_id", "text")
    // bench item 10 quotes 6 consecutive tokens of doc 1 -> two 5-grams
    val bench = Seq(
      (10L, "beta gamma delta epsilon zeta eta"),
      (11L, "completely fresh benchmark question text")).toDF("bench_id", "text")
    val out = Curate.decontaminate(corpus, "doc_id", "text",
      bench, "bench_id", "text", n = 5)
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"), "bench side must broadcast")
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 2L) // two shared 5-grams
    assert(r.getDouble(3) == 1.0) // the bench item is fully contaminated
  }

  test("unigram scoring: common text outranks gibberish; OOV maps to zero") {
    val fixture = Seq(
      (1L, "the cat and the dog and the cat"),
      (2L, "the dog and the cat"),
      (3L, "zyx wvu tsr qpo nml")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramScore(fixture, "doc_id", "text",
        vocabSize = 100)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(8L, 5L, 5L)) // n_toks
    // corpus counts: the=5, and=3, cat=3, dog=2, singles=1 each
    // doc1 sum = 5+3+3+5+2+3+5+3 = 29; doc2 = 5+2+3+5+3 = 18; doc3 = 5
    assert(out.map(_.getDouble(2)).toSeq == Seq(29.0, 18.0, 5.0))
    val rel = out.map(r => r.getLong(0) -> r.getAs[Double]("mean_rel_freq")).toMap
    val lp = out.map(r => r.getLong(0) -> r.getAs[Double]("mean_logprob")).toMap
    assert(rel(1L) > rel(2L) && rel(2L) > rel(3L))
    assert(lp(1L) > lp(3L) && lp(2L) > lp(3L))
    // tiny vocab: gibberish tokens fall out entirely
    val oov = TextAnalysis.unigramScore(fixture, "doc_id", "text",
        vocabSize = 2)
      .filter("doc_id = 3").head()
    assert(oov.getAs[Double]("sum_gcount") == 0.0)
  }

  test("buildTrainingCorpus: curates, collapses near-dups, decontaminates, packs") {
    // corpus: 60 real docs + near-dup twins of docs 0-4 (survive exact
    // dedup, caught by MinHash) + a benchmark quoting doc 10
    val base = docs.filter("doc_id < 60")
    val aug = base.union(base.filter("doc_id < 5").selectExpr(
      "doc_id + 100000 AS doc_id", "concat(text, ' zz') AS text"))
    val bench = base.filter("doc_id = 10").selectExpr(
      "doc_id + 500000 AS bench_id",
      "concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), 3, 20)) AS text")
    val build = Pipelines.buildTrainingCorpus(aug, "doc_id", "text",
      bench = Some(bench), keepLangs = Seq("en", "und"), minQuality = 0.0,
      dedupThreshold = 0.5, contaminationN = 5, packBudget = 500,
      packShards = 4)
    val ids = build.corpus.select("doc_id").collect().map(_.getLong(0)).toSet
    // twins collapsed: the +100000 copy drops, the original stays
    assert((0L until 5L).forall(ids.contains), ids.toString)
    assert(!ids.exists(_ >= 100000L), ids.toString)
    // the benchmark-quoted doc left the corpus, and the audit trail
    // names it
    assert(!ids.contains(10L))
    val contamIds = build.contaminated.get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(contamIds.contains(10L))
    // near-dup audit: exactly the five twin pairs
    val pairs = build.nearDupPairs.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).map(i => (i, i + 100000L)).toSet.subsetOf(pairs))
    // packs cover every surviving doc exactly once, budget respected
    val packed = build.packs.collect()
    assert(packed.map(_.getLong(0)).toSet == ids)
    val perPack = build.packs.groupBy("shard", "pack_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t")).collect()
    // contiguous packing overshoots by at most one document's tokens
    val maxDocToks = packed.map(_.getLong(2)).max
    assert(perPack.forall(_.getLong(2) <= 500 + maxDocToks))
  }

  test("simhash: identical docs distance 0, mutated docs close, hamming symmetric") {
    val aug = docs.limit(50).union(docs.limit(50).selectExpr(
      "doc_id + 100000 AS doc_id", "text"))
    val pairs = Dedup.simhashPairs(aug, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val twins = (0 until 50).map(i => docs.limit(50).collect()(i)).map(_.getLong(0))
      .map(id => (id, id + 100000)).toSet
    assert(twins.subsetOf(pairs), "identical texts must have distance 0")
  }

  test("int8 quantization: bounded reconstruction error, exact top-1 self-match") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.75f)),
      (2L, Array(2.0f, 1.0f, -2.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: scale 0, codes 0
      (4L, Array(-0.1f, 0.3f, 0.2f, -0.4f))).toDF("vec_id", "embedding")
    val q = Similarity.int8Quantize(vecs, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Int](2))).sortBy(_._1)
    val orig = vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble))).sortBy(_._1).toMap
    q.foreach { case (id, scale, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127), s"id $id code range")
      // dequantization error ≤ scale/2 per element (half-up rounding)
      codes.zip(orig(id)).foreach { case (c, e) =>
        assert(math.abs(c * scale - e) <= scale / 2 + 1e-12,
          s"id $id: code $c * $scale vs $e")
      }
      // the max-|e| element must hit ±127 exactly (symmetric scaling)
      if (scale > 0) assert(codes.map(math.abs).max == 127, s"id $id")
    }
    assert(q(2)._2 == 0.0 && q(2)._3.forall(_ == 0)) // zero vector
    // quantized top-k: the query vector's own row wins (ties by id)
    val top = Similarity.int8TopK(vecs, "vec_id", "embedding",
      orig(2L), 2).collect()
    assert(top.head.getLong(0) == 2L)
  }

  test("int8 quantization computes the vector max once per row, not per element") {
    // the O(dim²) trap: inlining array_max into the transform lambda
    // re-scans the vector per ELEMENT (lambdas get no subexpression
    // elimination). The bound `__mx` column must survive CollapseProject:
    // exactly one array_max in the optimized plan.
    // non-literal input: a LocalRelation of literals would constant-fold
    // the whole projection away and hide the plan shape
    val vecs = spark.range(10).selectExpr("id AS vec_id",
      "array(CAST(id AS FLOAT), CAST(-id AS FLOAT)) AS embedding")
    val plan = Similarity.int8Quantize(vecs, "vec_id", "embedding")
      .queryExecution.optimizedPlan.toString
    val n = "array_max".r.findAllIn(plan).length
    assert(n == 1, s"array_max must appear exactly once, got $n:\n$plan")
    // and the linear-vs-quadratic difference is observable: quantizing
    // 10k rows at dim 2048 is ~20M element ops (sub-second); the inlined
    // form would be ~40G (minutes). A loose wall bound separates them
    // robustly on any machine.
    val wide = spark.range(10000).selectExpr("id AS vec_id",
      "transform(sequence(1, 2048), i -> CAST(hash(id, i) % 1000 AS FLOAT) / 1000.0) AS embedding")
    val t0 = System.nanoTime()
    Similarity.int8Quantize(wide, "vec_id", "embedding")
      .selectExpr("sum(qvec[0])").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // 90 s, not 30: the linear form is sub-second alone but this suite
    // runs in parallel with the whole test universe on a sandbox whose
    // disk intermittently throttles (measured 44 s under full-suite
    // contention with the plan gate above GREEN); the quadratic form
    // is ~40G lambda ops = many MINUTES, so the separation holds
    assert(secs < 90.0, s"dim-2048 quantize took $secs s — quadratic?")
  }

  test("mrl top-k: full-candidate run equals exact top-k; coarse pass keeps self") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val n = emb.count().toInt
    // candidates = corpus size → the rerank sees everything → identical
    // to brute-force exact top-k, cell for cell
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val mrlAll = Similarity.mrlTopK(emb, "vec_id", "embedding", q,
        prefixDims = 16, candidates = n, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(mrlAll.toSeq == exact.toSeq)
    // a REAL coarse pass (100 of the corpus) still ranks the query's own
    // vector first at cosine 1.0 (its prefix cosine is 1.0 too)
    val mrl = Similarity.mrlTopK(emb, "vec_id", "embedding", q,
      prefixDims = 16, candidates = 100, k = 10).collect()
    assert(mrl.head.getLong(0) == 0L)
    assert(math.abs(mrl.head.getDouble(1) - 1.0) < 1e-9)
    assert(mrl.length == 10)
  }

  test("label centroids: exact per-dimension means, labels x dim rows") {
    val vecs = Seq(
      (0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)),
      (1, Array(-2.0f, 0.0f))).toDF("label", "embedding")
    val out = Similarity.labelCentroids(vecs, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (0, 0, 2.0, 2L), (0, 1, 4.0, 2L), (1, 0, -2.0, 1L), (1, 1, 0.0, 1L)))
  }

  test("containment finds near-subsets that jaccard misses") {
    val aug = docs.limit(40).union(docs.limit(40).selectExpr(
      "doc_id + 100000 AS doc_id",
      // first half of the tokens: a strict near-subset
      "concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), 1, " +
        "CAST(floor(size(split(lower(trim(text)), '\\\\s+')) / 2) AS INT)" +
        ")) AS text"))
    val cont = Dedup.containmentPairs(aug, "doc_id", "text",
        n = 5, threshold = 0.9, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getDouble(4)))
    val truncPairs = cont.filter { case (a, b, _, _) => b == a + 100000 }
    assert(truncPairs.length >= 35, s"got ${truncPairs.length}")
    // every 5-gram of the half-doc is a 5-gram of the original: the
    // small side's containment is EXACTLY 1.0
    assert(truncPairs.forall { case (_, _, cA, cB) => math.max(cA, cB) == 1.0 })
    // jaccard at the same threshold misses them (≈ 0.5 overlap)
    val jac = Dedup.ngramJaccard(aug, "doc_id", "text", n = 5,
        threshold = 0.9, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .count { case (a, b) => b == a + 100000 }
    assert(jac == 0, "jaccard 0.9 must not see half-doc subsets")
  }

  test("bigram LM: exact counts, conditional prob is c_ab/c_a, topK ordered") {
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLM(corpus, "doc_id", "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val byBigram = out.map(t => t._1 -> t).toMap
    // "the cat": 2 of 3 "the"; "cat sat": 1 of 2 "cat"
    assert(byBigram("the cat") == (("the cat", 2L, 3L, 2.0 / 3.0)))
    assert(byBigram("cat sat") == (("cat sat", 1L, 2L, 0.5)))
    assert(byBigram("the dog") == (("the dog", 1L, 3L, 1.0 / 3.0)))
    // ordering: count desc then bigram asc
    assert(out.head._1 == "the cat")
    assert(out.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("bm25: only term-hitting docs score, more-hits-shorter-doc ranks higher") {
    val corpus = Seq(
      (1L, "spark query engine query query"), // tf(query)=3, short
      (2L, "a long document about a query and many other things entirely unrelated"),
      (3L, "nothing relevant here at all"),
      (4L, "query engine")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(corpus, "doc_id", "text", Seq("query", "engine"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    // doc 3 has no query terms: absent (score would be exactly 0)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L))
    val byId = out.map(t => t._1 -> t).toMap
    // doc 1: high tf + both terms... (1 hits query+engine? 1 has engine
    // once, query 3x → n_terms_hit 2); doc 2: one hit, long → lowest
    assert(byId(1L)._3 == 2 && byId(2L)._3 == 1 && byId(4L)._3 == 2)
    assert(byId(1L)._2 > byId(2L)._2, "tf-rich short doc beats long one-hit doc")
    assert(byId(4L)._2 > byId(2L)._2, "short two-hit doc beats long one-hit doc")
    assert(out.forall(_._2 > 0.0), "Lucene idf is non-negative")
  }

  test("vocab encode: rank-ordered ids, OOV drops, order restored from positions") {
    val corpus = Seq(
      (1L, "b a a c b a"),
      (2L, "a b zzz"),
      (3L, "c a b")).toDF("doc_id", "text")
    // freqs: a=5, b=4, c=2, zzz=1 → ids a=1 b=2 c=3 (vocabSize 3; zzz OOV)
    val out = TextAnalysis.vocabEncode(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 6L, "2 1 1 3 2 1")))
    assert(out(1) == ((2L, 2L, "1 2"))) // zzz dropped
    assert(out(2) == ((3L, 3L, "3 1 2")))
  }

  test("boilerplate: per-source template shingles surface, cross-source ones don't") {
    val corpus = (0L until 20L).map { i =>
      val src = if (i < 10) "sA" else "sB"
      val header = if (i < 10) "alpha beta gamma delta epsilon zeta"
      else "one two three four five six"
      (i, s"$header unique$i word$i tail$i", src)
    }.toDF("doc_id", "text", "source")
    val out = TextAnalysis.boilerplate(corpus, "doc_id", "text", "source",
      n = 5, minDocs = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // each 6-token header has two 5-gram shingles shared by all 10 docs
    // of its source; shingles bridging into the unique tail never repeat
    assert(out.length == 4)
    assert(out.filter(_._1 == "sA").forall(t =>
      t._3 == 10 && t._2.startsWith("alpha") || t._2.startsWith("beta")))
    assert(out.count(_._1 == "sA") == 2 && out.count(_._1 == "sB") == 2)
  }

  test("sign bits pack 32 per word; hamming self-distance 0, flips count exactly") {
    val dim = 40
    val base = Array.tabulate(dim)(i => if (i % 3 == 0) 1.0f else -1.0f)
    // flip 3 known dims, incl. one in the second word (dim 35)
    val flipped = base.clone()
    Seq(0, 7, 35).foreach(i => flipped(i) = -flipped(i))
    val vecs = Seq((1L, base), (2L, flipped)).toDF("vec_id", "embedding")
    val q = base.map(_.toDouble).toSeq
    val out = Similarity.hammingTopK(vecs, "vec_id", "embedding", q, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out(0) == ((1L, 0L)), "self-distance is 0 and ranks first")
    assert(out(1) == ((2L, 3L)), "exactly the 3 flipped sign bits differ")
  }

  test("weighted sample: monotone in weight, 0 keeps nothing, 1 keeps ~all") {
    val ids = spark.range(0L, 2000L).selectExpr("id AS doc_id")
    def kept(w: Double): Set[Long] =
      Sampling.weightedSample(ids, "doc_id", org.apache.spark.sql.functions.lit(w))
        .collect().map(_.getLong(0)).toSet
    val k0 = kept(0.0); val k3 = kept(0.3); val k7 = kept(0.7); val k1 = kept(1.0)
    assert(k0.isEmpty)
    assert(k3.subsetOf(k7) && k7.subsetOf(k1), "higher weight keeps a superset")
    assert(k1.size == 2000, "weight 1 keeps everything (md5 prefix < ffffffff)")
    // rates land near the weights (hash-uniform)
    assert(math.abs(k3.size / 2000.0 - 0.3) < 0.05)
    assert(math.abs(k7.size / 2000.0 - 0.7) < 0.05)
  }

  test("knn join: self first, ranks contiguous, candidates within probe radius") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val out = Similarity.knnJoin(
      emb.filter($"vec_id" < 5), "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 3, nPlanes = 8)
    // the query side must broadcast; the corpus side must not shuffle
    // for candidate generation
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    val rows = out.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, rs) =>
      // rank 1 is the query itself at cosine 1.0 (it shares its own
      // signature bucket by construction)
      val first = rs.find(_.getInt(3) == 1).get
      assert(first.getLong(1) == q && math.abs(first.getDouble(2) - 1.0) < 1e-9)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
      assert(rs.length <= 3)
      // neighbors are within hamming 1 of the query signature
      val sigOf = emb.withColumn("s",
          Similarity.axisSignature($"embedding", 8))
        .select("vec_id", "s").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rs.foreach(r => assert(
        java.lang.Long.bitCount(sigOf(q) ^ sigOf(r.getLong(1))) <= 1))
    }
  }

  test("ann LSH top-k has high recall vs exact top-k") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annTopK(emb, "vec_id", "embedding", q, 10,
      nPlanes = 12, maxHammingProbe = 4).collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall too low: $recall (exact=$exact ann=$ann)")
  }

  test("precomputed signature-partitioned ANN: same results, pruned scan") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val path = java.nio.file.Files
      .createTempDirectory("graft-annidx").toString + "/emb_by_sig"
    Similarity.writeSignaturePartitioned(emb, "embedding", 12, q.length, path)
    val pre = Similarity.annTopKPrecomputed(spark, path, "vec_id",
      "embedding", q, 10, nPlanes = 12, maxHammingProbe = 4)
    // identical results to the recompute-at-query-time form
    val live = Similarity.annTopK(emb, "vec_id", "embedding", q, 10,
        nPlanes = 12, maxHammingProbe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pre.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == live)
    // the probe must PRUNE: partition filters reach the scan and the
    // files actually read are a strict subset of the partition dirs
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("lsh_sig"), s"no partition pruning in plan:\n$plan")
    // same probe enumeration as annTopKPrecomputed
    val pl = Similarity.planes(12, q.length)
    val qSig = pl.zipWithIndex.map { case (plane, p) =>
      if (plane.zip(q).map { case (a, b) => a * b }.sum > 0.0) 1L << p else 0L
    }.sum
    val probes = scala.collection.mutable.ArrayBuffer(qSig)
    def flip(base: Long, startBit: Int, left: Int): Unit =
      if (left > 0) (startBit until 12).foreach { b =>
        val f = base ^ (1L << b); probes += f; flip(f, b + 1, left - 1)
      }
    flip(qSig, 0, 4)
    val totalParts = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("lsh_sig="))
    // pre-shuffle scan (input_file_name is lost past an exchange)
    val readParts = spark.read.parquet(path)
      .filter($"lsh_sig".isin(probes.toSeq: _*))
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect()
      .map(_.getString(0).split("lsh_sig=")(1).split("/")(0)).distinct
    assert(readParts.length < totalParts,
      s"probe read ${readParts.length} of $totalParts partitions — no pruning")
  }

  test("PQ/ADC top-k recalls most of the exact top-k and reranks exactly") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val idx = Similarity.pqBuild(emb, "vec_id", "embedding", dim = q.length,
      m = 8, k = 16, sampleN = 500)
    val pq = Similarity.pqTopK(idx, "vec_id", "embedding", q, 10,
      rerank = 50)
    val got = pq.collect()
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & got.map(_.getLong(0)).toSet).size.toDouble / 10
    assert(recall >= 0.5, s"PQ recall too low: $recall")
    // reranked scores are EXACT cosines (self-match scores 1.0)
    assert(math.abs(got.head.getDouble(1) - 1.0) < 1e-12)
    // codes are small ints within the codebook
    val codes = idx.encoded.select("pq_0").distinct().collect()
      .map(_.getInt(0))
    assert(codes.forall(c => c >= 0 && c < 16))
  }

  test("piiScan counts and redacts fixture PII") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or call 555-123-4567"),
      (2L, "ssn 123-45-6789 from host 192.168.0.1 and 10.0.0.1"),
      (3L, "nothing sensitive here")).toDF("id", "text")
    val out = TextAnalysis.piiScan(df, "id", "text").orderBy("id").collect()
    assert(out(0).getInt(1) == 1 && out(0).getInt(2) == 1) // email + phone
    assert(out(0).getString(5) == "mail me at <EMAIL> or call 555-123-4567")
    assert(out(1).getInt(3) == 1 && out(1).getInt(4) == 2) // ssn + 2 ips
    assert(out(2).getInt(1) + out(2).getInt(2) + out(2).getInt(3) +
      out(2).getInt(4) == 0)
  }

  test("repetition flags duplicate sentences and bigram loops") {
    val df = Seq(
      (1L, "the cat sat. the cat sat. the dog ran. "),
      (2L, "go go go go go go"),
      (3L, "x")).toDF("id", "text")
    val out = TextAnalysis.repetition(df, "id", "text").orderBy("id").collect()
    // doc 1: 4 sentence splits ("the cat sat", dup, "the dog ran", ""),
    // 3 distinct
    assert(out(0).getInt(1) == 4 && out(0).getInt(2) == 3)
    // doc 2: bigrams are 5x "go go" -> full concentration
    assert(out(1).getLong(3) == 5L && out(1).getLong(4) == 1L &&
      out(1).getDouble(6) == 1.0)
    // doc 3: single token -> zeroed bigram stats, frac 0
    assert(out(2).getLong(3) == 0L && out(2).getDouble(6) == 0.0)
  }

  test("ann LSH probes fewer vectors than the full scan") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val bucketed = Similarity.lshBuckets(emb, "embedding", 12, q.length)
    val pl = Similarity.planes(12, q.length)
    val qSig = pl.zipWithIndex.map { case (plane, p) =>
      if (plane.zip(q).map { case (a, b) => a * b }.sum > 0.0) 1L << p else 0L
    }.sum
    val probed = bucketed
      .filter(org.apache.spark.sql.functions.expr(
        s"bit_count(lsh_sig ^ ${qSig}L) <= 4")).count()
    val total = emb.count()
    assert(probed < total, s"probe set $probed must prune vs $total")
  }

  test("langid picks the right language on real-language fixtures") {
    val fixtures = Seq(
      (1L, "the cat sat on the mat and it is a good day for the town"),
      (2L, "der hund ist nicht zu hause und ich bin mit der katze"),
      (3L, "le chat est dans la maison et les enfants sont pour une fete"),
      (4L, "el perro es un animal y los gatos son una familia de la casa"),
      (5L, "的 是 了 在 我 有 和 不 这 他"),
      (6L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(fixtures, "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "zh", 6L -> "und"))
  }

  test("quality score ranks clean text above junk") {
    val fixtures = Seq(
      (1L, "A well formed paragraph of reasonable length that continues " +
        "with meaningful words and proper structure throughout the text."),
      (2L, "1234567890 9876543210 0000000 111111 22222 3333"),
      (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityScore(fixtures, "text")
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) && got(1L) > got(3L))
    assert(got(2L) < 0.2)
  }

  test("fingerprint is stable under whitespace/case noise") {
    val fixtures = Seq(
      (1L, "Hello   World  foo bar baz"),
      (2L, "hello world foo bar baz"),
      (3L, "something else entirely here now")).toDF("doc_id", "text")
    val got = TextAnalysis.fingerprint(fixtures, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("shingles of short docs are empty, not inverted sequences") {
    val tiny = Seq((1L, "only three words"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.shingles(tiny, "doc_id", "text", 5).count() == 0)
  }

  test("ivf ANN: probes subset of cells, high recall vs exact") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8)
    val probed = index.assigned.filter(
      org.apache.spark.sql.functions.col("ivf_cell").isNotNull).count()
    assert(probed == emb.count())
    val ann = Similarity.ivfTopK(index, "vec_id", "embedding", q, 10,
      nProbe = 3).collect().map(_.getLong(0)).toSet
    val candidates = index.assigned.count()
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
  }
}
