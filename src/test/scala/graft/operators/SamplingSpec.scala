package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape and semantics of the corpus-construction operators
  * (deterministic sampling, sequence packing, domain mixing).
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val docs = graft.Tables
    .load(spark, "/root/testdata/sf0.001", "documents")
    .select("doc_id", "text")

  test("hashSample: deterministic, near-rate, and shuffle-free") {
    val s1 = Sampling.hashSample(docs, "doc_id",
      Sampling.rateToThreshold(0.2))
    val ids = s1.select("doc_id").collect().map(_.getLong(0)).sorted
    // deterministic: the same documents every run
    val again = Sampling.hashSample(docs, "doc_id",
      Sampling.rateToThreshold(0.2))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(again))
    // md5 prefixes are uniform: rate lands near 20%
    val n = docs.count().toDouble
    assert(ids.length / n > 0.08 && ids.length / n < 0.35,
      s"${ids.length} of $n sampled")
    // scan-local filter: no Exchange anywhere in the plan
    val plan = s1.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("targetEncode: out-of-fold means with m-estimate smoothing, hand-computed") {
    import spark.implicits._
    // cat A: y = 1,1,0,1 in folds 0,0,1,1; cat B: y = 0,0 in folds 0,1
    // global prior = 3/6 -> 500000 micro; smoothing m = 2
    val rows = Seq(("A", 1L, 0L), ("A", 1L, 0L), ("A", 0L, 1L),
      ("A", 1L, 1L), ("B", 0L, 0L), ("B", 0L, 1L))
    val out = Sampling.targetEncode(rows.toDF("cat", "y", "fold"),
        "cat", "y", "fold", smoothing = 2L)
      .orderBy("cat", "fold")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // (A,0): ((3-2)*1e6 + 2*500000) div (4-2+2) = 500000
      ("A", 0L, 2L, 2L, 500000L, 500000L),
      // (A,1): ((3-1)*1e6 + 1e6) div 4 = 750000
      ("A", 1L, 2L, 1L, 500000L, 750000L),
      // (B,*): ((0-0)*1e6 + 1e6) div (2-1+2) = 333333
      ("B", 0L, 1L, 0L, 500000L, 333333L),
      ("B", 1L, 1L, 0L, 500000L, 333333L)))
  }

  test("packSequences: contiguous budget packing, one shuffle on shard") {
    val budget = 512L
    val packed = Sampling.packSequences(docs, "doc_id", "text", budget,
      nShards = 4)
    val rows = packed.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getLong(3)))
    // replay the contiguous-cumsum definition locally
    rows.groupBy(_._2).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._1).foreach { case (id, _, toks, packId) =>
        assert(packId == cum / budget,
          s"doc $id: expected pack ${cum / budget}, got $packId")
        cum += toks
      }
    }
    // exactly one Exchange — the hash partition on the shard key
    // (AdaptiveSparkPlan.toString repeats the tree under "Initial Plan";
    // count only the executed section)
    val plan = packed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.linesIterator.count(_.contains("Exchange ")) == 1,
      s"packing must shuffle exactly once:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(shard"),
      s"the one shuffle must key on shard:\n$plan")
  }

  test("chunkDocuments: full coverage, exact overlap, shuffle-free") {
    val chunked = Sampling.chunkDocuments(docs, "doc_id", "text",
      chunkTokens = 64, overlap = 16)
    val byDoc = chunked.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val docToks = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).trim.toLowerCase
        .replaceAll("\\s+", " ").split(" ")
    }.toMap
    byDoc.foreach { case (id, chunks) =>
      val toks = docToks(id)
      val sorted = chunks.sortBy(_._2)
      // contiguous chunk ids from 0
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      sorted.foreach { case (_, idx, text, nToks) =>
        val start = (idx * 48).toInt
        val expect = toks.slice(start, start + 64)
        assert(text == expect.mkString(" "),
          s"doc $id chunk $idx text mismatch")
        assert(nToks == expect.length.toLong)
      }
      // every token is covered; adjacent chunks share exactly 16 tokens
      // (except a short final chunk, which shares what remains)
      val last = sorted.last
      assert(last._2 * 48 + last._4 == toks.length.toLong,
        s"doc $id coverage gap")
      if (sorted.length > 1)
        assert(sorted.init.forall(_._4 == 64L),
          s"doc $id non-final chunk not full")
    }
    // scan-local: a row explosion must not introduce any exchange
    val plan = chunked.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("domainMix: per-language caps with contiguous deterministic ranks") {
    val mixed = Sampling.domainMix(docs, "doc_id", "text", perGroup = 10)
    val rows = mixed.collect().map(r =>
      (r.getString(1), r.getInt(3), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (lang, group) =>
      assert(group.length <= 10, s"$lang exceeded the cap")
      assert(group.map(_._2).sorted.sameElements(1 to group.length),
        s"$lang ranks must be contiguous from 1")
      // ranks follow quality descending
      val byRank = group.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cdcChunk: full coverage, contiguous ids, boundaries move with content") {
    import spark.implicits._
    val out = Sampling.cdcChunk(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong))
    val byDoc = out.groupBy(_._1)
    val tokCounts = docs.selectExpr("doc_id",
      "size(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) AS n")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // chunk ids contiguous from 1; token coverage exact and disjoint
      assert(sorted.map(_._2).sameElements(1L to sorted.length))
      assert(sorted.map(_._3).sum == tokCounts(id), s"doc $id coverage")
      // each chunk starts where the previous ended
      sorted.sliding(2).foreach {
        case Array((_, _, n0, p0), (_, _, _, p1)) => assert(p1 == p0 + n0)
        case _ =>
      }
    }
    // content-defined stability: shifting a doc by a 200-token prefix
    // leaves the boundary STRUCTURE of the tail intact (same chunk
    // sizes after the first post-prefix boundary) — the property
    // fixed-budget chunking does not have
    // a doc with interior boundaries (≥3 chunks), so the tail structure
    // is non-trivial
    val richId = byDoc.filter(_._2.length >= 3).keys.min
    val base = docs.filter($"doc_id" === richId).head().getString(1)
    val prefix = (1 to 200).map(i => s"pfx$i").mkString(" ")
    val two = Seq((1L, base), (2L, s"$prefix $base")).toDF("doc_id", "text")
    val c2 = Sampling.cdcChunk(two, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong))
    val sizes1 = c2.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val shifted = c2.filter(_._1 == 2L).sortBy(_._2)
      .dropWhile(_._4 < 201 + 2) // chunks overlapping prefix+bridge grams
      .map(_._3)
    assert(shifted.nonEmpty && sizes1.containsSlice(shifted),
      s"tail chunk sizes survive a prefix shift " +
        s"(doc $richId: ${sizes1.toSeq} vs shifted ${shifted.toSeq})")
  }

  test("gapFill: idle buckets emit zeros, span exact, active buckets match agg") {
    import spark.implicits._
    val dayNs = 86400000000000L
    val e = Seq(
      (1L, 0L * dayNs + 5L, 1.5), (1L, 0L * dayNs + 9L, 2.0),
      (1L, 3L * dayNs + 1L, 4.25), // days 1-2 idle for user 1
      (2L, 2L * dayNs, 10.0)).toDF("user_id", "ts", "value")
    val out = graft.operators.Resample
      .gapFill(e, Seq("user_id"), "ts", "value", dayNs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 2L, 3.5), (1L, 1L, 0L, 0.0), (1L, 2L, 0L, 0.0),
      (1L, 3L, 1L, 4.25), (2L, 2L, 1L, 10.0)))
  }
}
