package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float|double>`).
  *
  * - [[cosineTopK]]: brute-force exact top-k — expression-only dot
  *   product (`aggregate(zip_with(...))`, whole-stage codegen), one scan
  *   + a TakeOrdered; the correctness baseline.
  * - [[lshBuckets]] / [[annTopK]]: random-hyperplane LSH — each vector
  *   gets a `nPlanes`-bit signature; the query probes only vectors whose
  *   signature is within `maxHammingProbe` bits, then reranks exactly.
  *   At 100 TB the bucketed table is written partitioned by signature so
  *   a probe prunes to a handful of partitions.
  */
object Similarity {
  /** Exact cosine similarity between an array column and a literal
    * query vector, computed in double, sequential fold order.
    */
  def cosine(vec: Column, q: Seq[Double]): Column = {
    val qArr = array(q.map(lit): _*)
    val v = transform(vec, x => x.cast("double"))
    val dot = aggregate(zip_with(v, qArr, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val n1 = sqrt(aggregate(transform(v, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    val n2 = math.sqrt(q.map(x => x * x).sum)
    dot / (n1 * lit(n2))
  }

  /** Symmetric per-vector int8 scalar quantization: each vector scales
    * by its own max|e| onto [-127, 127] with half-up rounding
    * (floor(x·127/max + 0.5) — floor is exact in any IEEE engine, so
    * the quantized codes are bit-portable, unlike a round() whose
    * half-tie rule varies). Emits (id, scale, qvec): `scale` = max/127
    * reconstructs e ≈ q·scale. 4× smaller than float32 and integer
    * dot products downstream — the standard first rung of the
    * quantization ladder below [[pqEncode]]'s codebooks. All-zero
    * vectors quantize to zeros with scale 0. Expression-only: a
    * scan-local map, no shuffle at any corpus size.
    */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    // `__mx` must be a bound column, NOT the array_max expression inlined
    // into the transform lambda: lambdas get no subexpression elimination,
    // so an inlined max re-scans the vector per ELEMENT — O(dim²) per row
    // (see the same rule at Dedup.shingleArray). With ≥2 references to a
    // non-cheap column CollapseProject keeps the projections separate and
    // the max is computed once per row.
    df.withColumn("__mx",
        array_max(transform(col(vecCol), e => abs(e.cast("double")))))
      .select(col(idCol),
        (col("__mx") / 127.0).as("scale"),
        transform(col(vecCol), e =>
          when(col("__mx") === 0.0, lit(0))
            .otherwise(floor(e.cast("double") * 127.0 / col("__mx") + 0.5)
              .cast("int"))).as("qvec"))
  }

  /** Deterministic ±1 sign matrix for [[signProject]]: entry (k, j) is
    * +1 when the first hex digit of md5("j_k") is even — a seedable,
    * engine-portable stand-in for a Gaussian sketch matrix (any SQL
    * engine's md5 reproduces it verbatim, which is what lets the
    * DuckDB oracle rebuild the identical matrix from scratch).
    */
  def signMatrix(outDim: Int, inDim: Int): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDim).map(k => (0 until inDim).map { j =>
      val hex = md.digest(s"${j}_$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if ("02468ace".contains(hex.charAt(0))) 1L else -1L
    })
  }

  /** Johnson–Lindenstrauss SIGN projection: sketch an INTEGER-valued
    * vector column (e.g. [[int8Quantize]]'s qvec) down to `outDim`
    * coordinates, each the ±1-signed sum of all input coordinates.
    * Because inputs and signs are integers, every projected coordinate
    * is an exact long — no accumulation-order drift — so projected dot
    * products (and hence the candidate ranking a projected ANN pass
    * produces) are bit-portable across engines, unlike a float Gaussian
    * sketch. dim reduction = outDim/inDim (8/64 → 8× fewer multiplies
    * per distance and 8× smaller sketch to broadcast).
    *
    * Expression-only scan-local map: the 100 TB side is projected in
    * place with no shuffle; the sign matrix is a literal folded into
    * codegen.
    */
  def signProject(qvec: Column, outDim: Int, inDim: Int): Column = {
    val m = signMatrix(outDim, inDim)
    array((0 until outDim).map { k =>
      aggregate(
        zip_with(qvec,
          array(m(k).map(lit): _*),
          (x, s) => x.cast("long") * s),
        lit(0L), (acc, x) => acc + x)
    }: _*)
  }

  /** Top-k by QUANTIZED dot product: both sides int8-quantized, scored
    * with an integer dot (≤ 127²·dim, exact in long), ties by id — so
    * unlike float ANN scores the whole ranking is engine-exact and
    * oracle-checkable cell-for-cell. One scan + TakeOrdered.
    */
  def int8TopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int): DataFrame = {
    val qmx = if (q.isEmpty) 0.0 else q.map(math.abs).max
    val qq: Seq[Int] =
      if (qmx == 0.0) q.map(_ => 0)
      else q.map(e => math.floor(e * 127.0 / qmx + 0.5).toInt)
    val qArr = array(qq.map(lit): _*)
    int8Quantize(df, idCol, vecCol)
      .select(col(idCol),
        aggregate(zip_with(col("qvec"), qArr,
            (a, b) => a.cast("long") * b),
          lit(0L), (acc, x) => acc + x).as("qdot"))
      .orderBy(col("qdot").desc, col(idCol).asc)
      .limit(k)
  }

  /** Brute-force exact top-k by cosine similarity to `q`, via the native
    * codegen expression ([[graft.functions.CosineToQuery]]) — one scan,
    * one TakeOrdered, no per-row array allocations.
    */
  def cosineTopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** Matryoshka-style two-stage top-k: rank ALL vectors by cosine over
    * only the first `prefixDims` dimensions (MRL-trained embeddings
    * front-load information, so the prefix is a usable coarse score),
    * keep the top `candidates`, then rerank those exactly at full
    * dimension. The coarse pass reads prefixDims/dim of the vector
    * bytes — at 100 TB that is the difference between scanning 4 TB and
    * 64 TB for the first stage — and both stages are one scan + one
    * TakeOrdered with deterministic id tiebreaks, so the whole ranking
    * replays in any engine.
    */
  def mrlTopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], prefixDims: Int, candidates: Int, k: Int)
      : DataFrame = {
    val qPre = q.take(prefixDims)
    df.select(col(idCol), col(vecCol),
        graft.functions.CosineToQuery(
          slice(col(vecCol), 1, prefixDims), qPre).as("pre_sim"))
      .orderBy(col("pre_sim").desc, col(idCol).asc)
      .limit(candidates)
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Per-label centroid components: (label, pos, mean_e, n_vecs) — the
    * class-prototype computation behind centroid classifiers, drift
    * monitors and IVF-style seeding. Emitted LONG (one row per
    * dimension), not as an array column: scalar outputs hash in any
    * gate, and the shape is what a downstream join wants anyway.
    * One scan-local posexplode + one map-side-combined aggregation
    * keyed (label, pos) — cardinality labels×dim, no collect.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String)
      : DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy("label", "pos")
      .agg(avg(col("e").cast("double")).as("mean_e"),
        count(lit(1)).as("n_vecs"))

  /** Deterministic pseudo-random hyperplanes: plane p, dim d ∈ [-1, 1).
    * Seeded by (p, d) through a 64-bit mix so every executor and every
    * session derives the same planes with no broadcast needed.
    */
  def planes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim) { (p, d) =>
      val h = scala.util.hashing.MurmurHash3.productHash((p, d)).toLong
      val mixed = (h * 0x9E3779B97F4A7C15L) >>> 11
      (mixed.toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  /** Signature column: bit p set iff vec · plane(p) > 0. Expression-only
    * (the plane constants are folded into the generated code).
    */
  def signature(vec: Column, pl: Array[Array[Double]]): Column = {
    // cast per ELEMENT inside each plane's lambda rather than binding a
    // transform(vec, cast) intermediate: an inlined cast-transform is
    // re-materialized once per PLANE (lambdas get no subexpression
    // elimination), i.e. nPlanes extra array allocations per row
    val bits = pl.zipWithIndex.map { case (plane, p) =>
      val planeArr = array(plane.map(lit).toSeq: _*)
      val dot = aggregate(
        zip_with(vec, planeArr, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Attach an LSH bucket signature to every row. */
  def lshBuckets(df: DataFrame, vecCol: String, nPlanes: Int,
      dim: Int): DataFrame =
    df.withColumn("lsh_sig", signature(col(vecCol), planes(nPlanes, dim)))

  /** ANN top-k: probe buckets within `maxHammingProbe` bits of the query
    * signature, rerank candidates exactly. Recall rises with nPlanes and
    * the probe radius; candidates shrink the scan by ~2^nPlanes/∑C(n,≤r).
    */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int, nPlanes: Int = 12,
      maxHammingProbe: Int = 2): DataFrame = {
    val pl = planes(nPlanes, q.length)
    val qSig = pl.zipWithIndex.map { case (plane, p) =>
      val dot = plane.zip(q).map { case (a, b) => a * b }.sum
      if (dot > 0.0) 1L << p else 0L
    }.sum
    val bucketed = lshBuckets(df, vecCol, nPlanes, q.length)
    bucketed
      .filter(expr(s"bit_count(lsh_sig ^ ${qSig}L) <= $maxHammingProbe"))
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** ANN top-k with the engine-portable axis-sign signature
    * ([[axisSignature]]): bucketing, hamming probe and exact rerank are
    * all plain arithmetic any SQL engine replays — the oracle-checkable
    * sibling of [[annTopK]] (whose seeded random hyperplanes give
    * better-spread buckets but live outside SQL).
    */
  def annTopKAxis(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int, nPlanes: Int = 12,
      maxHammingProbe: Int = 2): DataFrame = {
    val qSig = (0 until nPlanes).map(p =>
      if (q(p) > 0.0) 1L << p else 0L).sum
    df.withColumn("lsh_sig", axisSignature(col(vecCol), nPlanes))
      .filter(expr(s"bit_count(lsh_sig ^ ${qSig}L) <= $maxHammingProbe"))
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exact cosine between two array COLUMNS (pairwise, not
    * vector-vs-literal): sequential fold order, so the value is
    * deterministic under any partitioning and any engine replays it.
    * A zero-norm vector (padding / failed decode) yields NULL, not
    * NaN — Spark sorts NaN ABOVE every number, so an unguarded 0/0
    * would put a garbage vector at rank 1 of every descending top-k;
    * NULLs sort last under desc and drop out of rank windows cleanly.
    */
  def cosinePair(a: Column, b: Column): Column = {
    val va = transform(a, x => x.cast("double"))
    val vb = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(va, vb, (x, y) => x * y), lit(0.0),
      (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(va, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(vb, x => x * x), lit(0.0),
      (acc, x) => acc + x))
    dot / nullif(na * nb, lit(0.0))
  }

  /** Batch k-NN JOIN: the top-k `right` rows by exact cosine for EVERY
    * `left` row — the retrieval-augmentation / cross-corpus-linking
    * shape ("for each query doc, its nearest corpus neighbors").
    *
    * Candidates come from an equality join on the engine-portable
    * [[axisSignature]]: each left vector probes its own signature plus
    * every single-bit flip (when `probe`), the right side carries its
    * signature as a plain column. The left/probe side BROADCASTS (the
    * query set is small next to a 100 TB corpus), so the corpus never
    * shuffles for candidate generation; only the candidate pairs —
    * not the |L|×|R| cross product — pay the pairwise-cosine rerank
    * and the per-query top-k window. Probe values are pairwise
    * distinct, so a (query, neighbor) pair arises at most once — no
    * dedup pass needed. At 100 TB, pre-partition the right side by
    * signature ([[writeSignaturePartitioned]]) to also prune the scan.
    */
  def knnJoin(left: DataFrame, leftId: String, leftVec: String,
      right: DataFrame, rightId: String, rightVec: String,
      k: Int, nPlanes: Int = 8, probe: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.select(col(leftId).as("query_id"), col(leftVec).as("__qv"))
      .withColumn("__sig", axisSignature(col("__qv"), nPlanes))
    val masks = if (probe) 0L +: (0 until nPlanes).map(p => 1L << p)
      else Seq(0L)
    val probed = l.select(col("query_id"), col("__qv"),
      explode(array(masks.map(m =>
        col("__sig").bitwiseXOR(lit(m))): _*)).as("__probe"))
    val r = right.select(col(rightId).as("neighbor_id"),
        col(rightVec).as("__rv"))
      .withColumn("__rsig", axisSignature(col("__rv"), nPlanes))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    r.join(broadcast(probed), col("__rsig") === col("__probe"))
      .withColumn("cos_sim", cosinePair(col("__qv"), col("__rv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        col("__rn").as("knn_rank"))
  }

  /** The 100 TB ANN shape, materialized: write the corpus ONCE as a
    * signature-partitioned parquet table (`lsh_sig=<s>/` directories);
    * every later query probes only the partition directories within the
    * hamming radius — the scan reads a handful of buckets out of
    * 2^nPlanes, enforced by Spark partition pruning on the `lsh_sig`
    * partition column (verify `PartitionFilters` in `.explain`).
    */
  def writeSignaturePartitioned(df: DataFrame, vecCol: String,
      nPlanes: Int, dim: Int, path: String): Unit =
    lshBuckets(df, vecCol, nPlanes, dim)
      .write.partitionBy("lsh_sig").mode("overwrite").parquet(path)

  /** ANN top-k over a [[writeSignaturePartitioned]] table: enumerate the
    * signatures within `maxHammingProbe` of the query's (a driver-side
    * combinatorial walk, ∑C(nPlanes,≤r) values), filter the partition
    * column with an IN list so pruning happens at planning time, then
    * rerank candidates exactly. No signature is recomputed at query
    * time and unprobed partitions are never opened.
    */
  def annTopKPrecomputed(spark: SparkSession, path: String, idCol: String,
      vecCol: String, q: Seq[Double], k: Int, nPlanes: Int = 12,
      maxHammingProbe: Int = 2): DataFrame = {
    val pl = planes(nPlanes, q.length)
    val qSig = pl.zipWithIndex.map { case (plane, p) =>
      val dot = plane.zip(q).map { case (a, b) => a * b }.sum
      if (dot > 0.0) 1L << p else 0L
    }.sum
    // all signatures within hamming distance r of qSig
    val probes = scala.collection.mutable.ArrayBuffer(qSig)
    def flip(base: Long, startBit: Int, left: Int): Unit =
      if (left > 0) {
        var b = startBit
        while (b < nPlanes) {
          val f = base ^ (1L << b)
          probes += f
          flip(f, b + 1, left - 1)
          b += 1
        }
      }
    flip(qSig, 0, maxHammingProbe)
    spark.read.parquet(path)
      .filter(col("lsh_sig").isin(probes.toSeq: _*))
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF (inverted-file) index: k-means centroids over the embedding
    * space; every vector is assigned to its nearest centroid. A query
    * probes only the `nProbe` nearest centroid lists then reranks
    * exactly — at 100 TB the assigned table is written partitioned by
    * `ivf_cell` so a probe reads a handful of partitions.
    */
  final case class IvfIndex(centroids: Array[Array[Double]],
      assigned: DataFrame)

  def ivfBuild(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("__features").setPredictionCol("ivf_cell")
      .fit(feats)
    val assigned = model.transform(feats).drop("__features")
    IvfIndex(model.clusterCenters.map(_.toArray), assigned)
  }

  /** ANN top-k over an IVF index: probe the nProbe centroid cells
    * nearest to `q`, rerank candidates with the exact native cosine.
    */
  def ivfTopK(index: IvfIndex, idCol: String, vecCol: String,
      q: Seq[Double], k: Int, nProbe: Int = 3): DataFrame = {
    def dist2(c: Array[Double]): Double =
      c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    val probeCells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nProbe).map(_._2)
    index.assigned
      .filter(col("ivf_cell").isin(probeCells.toSeq: _*))
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Sign-bit packing into 32-bit words (one long per 32 dims): word w
    * holds bit p iff vec[w·32+p] > 0 — 1-bit binary quantization, the
    * cheapest rung of the quantization ladder (32× smaller than float32
    * and Hamming-scoreable with two instructions per word). 32-bit
    * words, not 64: bit 63 would need 2^63, which overflows signed
    * 64-bit arithmetic in any engine that checks (DuckDB raises,
    * ANSI Spark raises) — 2^31 stays exact everywhere, which keeps the
    * packing itself oracle-replayable.
    */
  def signBits(vec: Column, dim: Int): Column = {
    val words = (dim + 31) / 32
    array((0 until words).map { w =>
      (0 until math.min(32, dim - w * 32)).map { p =>
        when(element_at(vec, w * 32 + p + 1) > 0.0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Top-k nearest by Hamming distance over [[signBits]]: both sides
    * 1-bit quantized, distance = Σ_w popcount(word_w XOR qword_w),
    * ascending, ties by id. Every value is integer, so the whole
    * ranking is engine-exact — and the scan reads dim/32 longs per row
    * instead of dim floats. One scan + TakeOrdered, no shuffle.
    */
  def hammingTopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int): DataFrame = {
    val dim = q.length
    val words = (dim + 31) / 32
    val qWords: Seq[Long] = (0 until words).map { w =>
      (0 until math.min(32, dim - w * 32)).map { p =>
        if (q(w * 32 + p) > 0.0) 1L << p else 0L
      }.sum
    }
    val dist = (0 until words).map { w =>
      expr(s"bit_count(element_at(__bits, ${w + 1}) ^ ${qWords(w)}L)")
        .cast("long")
    }.reduce(_ + _)
    df.withColumn("__bits", signBits(col(vecCol), dim))
      .select(col(idCol), dist.as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(k)
  }

  /** Axis-aligned sign signature: bit p set iff vec[p] > 0. Blocking
    * quality is below random hyperplanes for general ANN, but for
    * NEAR-DUPLICATE detection (cosine ≥ ~0.95) sign patterns of
    * near-colinear vectors agree under any plane set — and axis planes
    * are replicable in any SQL engine, which makes the blocking itself
    * oracle-checkable (no hash internals).
    */
  def axisSignature(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map(p =>
      when(element_at(vec, p + 1) > 0.0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Grid-file IVF sibling: cells come from fixed axis bins over the
    * two leading dimensions (floor(e[d]/binWidth)) instead of k-means
    * centroids, the probe is the 3×3 neighborhood of the query's cell,
    * and candidates rerank exactly — the same partition→probe→rerank
    * shape as [[ivfTopK]] with an engine-portable cell function (the
    * DuckDB oracle replays it; k-means cells cannot be expressed in
    * SQL). Blocking quality is below learned centroids — this is the
    * conformance sibling, not the production path.
    */
  def ivfGridTopK(df: DataFrame, idCol: String, vecCol: String,
      q: Seq[Double], k: Int, binWidth: Double = 0.5): DataFrame = {
    val qc1 = math.floor(q(0) / binWidth)
    val qc2 = math.floor(q(1) / binWidth)
    df.withColumn("c1",
        floor(element_at(col(vecCol), 1).cast("double") / binWidth))
      .withColumn("c2",
        floor(element_at(col(vecCol), 2).cast("double") / binWidth))
      .filter(abs(col("c1") - qc1) <= 1 && abs(col("c2") - qc2) <= 1)
      .select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Product quantization over an IVF index: split each vector into `m`
    * subvectors, learn a small per-subspace centroid codebook (k-means
    * on a sample), and store each vector as `m` small codes. A query
    * builds one distance table per subspace (driver-side, m×k doubles)
    * and scores candidates as the sum of table lookups — asymmetric
    * distance computation (ADC). At 100 TB the PQ codes are ~dim/m ×
    * smaller than the raw vectors, so the probe scan reads bytes, not
    * floats; the top `rerank` ADC candidates are re-scored exactly.
    *
    * Codebooks are learned driver-side from `sampleN` vectors (k-means
    * is a bounded, iterative fit — the same shape Spark MLlib uses for
    * its initial centers); encoding and ADC scoring are pure column
    * expressions, fully distributed and codegen'd.
    */
  final case class PqIndex(codebooks: Array[Array[Array[Double]]], // m×k×sub
      encoded: DataFrame)

  def pqBuild(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 8, k: Int = 16, sampleN: Int = 2000,
      seed: Long = 42L): PqIndex = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val sample = df.select(col(vecCol).cast("array<double>"))
      .limit(sampleN).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "pqBuild: empty input")
    val rnd = new scala.util.Random(seed)
    val codebooks = Array.tabulate(m) { j =>
      val slices = sample.map(v => v.slice(j * sub, (j + 1) * sub))
      kmeansFit(slices, k, rnd)
    }
    pqFromCodebooks(df, idCol, vecCol, codebooks)
  }

  /** PQ index over GIVEN codebooks (no fit) — encode is per subspace the
    * argmin over the codebook of squared L2, expression-only (constants
    * fold into codegen), ties to the smallest code. The conformance
    * path: codebooks drawn from fixed corpus vectors are SQL-expressible,
    * so the whole encode + ADC + rerank pipeline is oracle-replayable
    * (q_pq_adc); [[pqBuild]] layers the k-means fit on top.
    */
  def pqFromCodebooks(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): PqIndex = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val codeCols = (0 until m).map { j =>
      val slice = org.apache.spark.sql.functions.slice(
        transform(col(vecCol), x => x.cast("double")), j * sub + 1, sub)
      argminCode(slice, codebooks(j)).as(s"pq_$j")
    }
    PqIndex(codebooks, df.select(col(idCol) +: col(vecCol) +: codeCols: _*))
  }

  /** Plain Lloyd k-means on the driver (bounded sample). */
  private def kmeansFit(xs: Array[Array[Double]], k: Int,
      rnd: scala.util.Random): Array[Array[Double]] = {
    val n = xs.length
    var centers = Array.tabulate(math.min(k, n))(i => xs(rnd.nextInt(n)).clone)
    for (_ <- 0 until 10) {
      val sums = Array.fill(centers.length)(
        new Array[Double](xs.head.length))
      val counts = new Array[Int](centers.length)
      xs.foreach { x =>
        val c = nearest(x, centers)
        counts(c) += 1
        var i = 0
        while (i < x.length) { sums(c)(i) += x(i); i += 1 }
      }
      centers = sums.zip(counts).zipWithIndex.map { case ((s, cnt), ci) =>
        if (cnt == 0) centers(ci) else s.map(_ / cnt)
      }
    }
    centers
  }

  private def nearest(x: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < x.length) { val t = x(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Expression: code of the nearest codebook centroid for a slice. */
  private def argminCode(slice: Column,
      codebook: Array[Array[Double]]): Column = {
    val dists = codebook.map { c =>
      val cArr = array(c.map(lit).toSeq: _*)
      aggregate(zip_with(slice, cArr, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
    }
    // argmin via struct-min over (dist, code)
    least(dists.zipWithIndex.toIndexedSeq.map { case (d, i) =>
      struct(d.as("d"), lit(i).as("c"))
    }: _*).getField("c")
  }

  /** ADC top-k: score = Σ_j table_j[code_j] where table_j holds the dot
    * product of the query's j-th slice with each centroid (cosine's
    * numerator; the query norm is constant and vector norms are folded
    * into the rerank). The top `rerank` ADC candidates re-score with
    * the exact codegen cosine.
    */
  def pqTopK(index: PqIndex, idCol: String, vecCol: String,
      q: Seq[Double], topK: Int, rerank: Int = 100): DataFrame = {
    val m = index.codebooks.length
    val sub = q.length / m
    val tables = Array.tabulate(m) { j =>
      val qs = q.slice(j * sub, (j + 1) * sub)
      index.codebooks(j).map(c => c.zip(qs).map { case (a, b) => a * b }.sum)
    }
    val adc = (0 until m).map { j =>
      val tArr = array(tables(j).map(lit).toSeq: _*)
      element_at(tArr, col(s"pq_$j") + 1)
    }.reduce(_ + _)
    val cand = index.encoded
      .withColumn("__adc", adc)
      .orderBy(col("__adc").desc, col(idCol).asc)
      .limit(math.max(rerank, topK))
    cand.select(col(idCol),
        graft.functions.CosineToQuery(col(vecCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket join (exact-match
    * signature blocking) + exact cosine verification ≥ threshold.
    * `axisBlocking=true` swaps the seeded random hyperplanes for
    * [[axisSignature]] (engine-replicable buckets, same recall story for
    * near-colinear duplicates).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nPlanes: Int = 12,
      axisBlocking: Boolean = false): DataFrame = {
    val sig =
      if (axisBlocking) axisSignature(col(vecCol), nPlanes)
      else signature(col(vecCol), planes(nPlanes, dim))
    val b = df.withColumn("lsh_sig", sig)
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("lsh_sig"))
    // per-element casts inside the folds (no bound transform(cast)
    // intermediate): same fold order and arithmetic, zero extra array
    // materializations per row — see the rule at [[signature]]
    val dot = aggregate(
      zip_with(col("va"), col("vb"),
        (a, c) => a.cast("double") * c.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    def norm(c: Column): Column = sqrt(aggregate(c, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    val n1 = norm(col("va"))
    val n2 = norm(col("vb"))
    b.as("a").join(b.as("b"),
        col("a.lsh_sig") === col("b.lsh_sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .withColumn("cos_sim", dot / (n1 * n2))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic deduplication
    * by cluster-scoped embedding cosine. Vectors are blocked into cells
    * ([[cosineNearDupPairs]]'s signature blocking — the paper's k-means
    * clusters, replaced by sign-signature cells so the blocking itself
    * is engine-replicable), pairs within a cell with cosine >=
    * `threshold` are semantic duplicates, and the paper's greedy
    * keep-one rule resolves each duplicate to the smallest id it
    * collides with: a row is REMOVED iff some smaller-id neighbor
    * passes the threshold; its representative is its smallest such
    * neighbor.
    *
    * Returns (removed, rep, n_dups): one row per removed vector. Rows
    * absent from the result are the kept set. Scale shape: the pair
    * join never leaves a cell, the greedy rule is one groupBy over the
    * (sparse) pair list — no iteration, no driver state.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nPlanes: Int = 12,
      axisBlocking: Boolean = false): DataFrame =
    cosineNearDupPairs(df, idCol, vecCol, dim, threshold, nPlanes,
        axisBlocking)
      .groupBy(col("id_b").as("removed"))
      .agg(min(col("id_a")).as("rep"), count(lit(1)).as("n_dups"))

  /** Partition-local exact k-NN GRAPH: for every row, its `k` nearest
    * same-`partCol` neighbors by exact cosine (desc, id-asc ties) —
    * the semantic-clustering / SemDeDup-preprocessing shape ("link each
    * point within its cluster"). The self-join is co-partitioned on the
    * cell key, so at 100 TB each cell meets only itself (one shuffle by
    * cell, candidate count bounded by the largest cell, never corpus ×
    * corpus); the per-source top-k is a bounded window over candidates.
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      partCol: String, k: Int): DataFrame = {
    // graft.functions.CosinePair: one codegen'd primitive loop per
    // pair (bit-equal to the zip_with/aggregate fold, which is
    // interpreted and allocates per row) — the verify stage of the
    // cell self-join stays inside whole-stage codegen
    val b = df.select(col(partCol).as("cell"), col(idCol).as("id"),
      col(vecCol).as("v"))
    val pairs = b.as("a").join(b.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id"))
      .select(col("a.cell").as("cell"), col("a.id").as("src"),
        col("b.id").as("dst"),
        graft.functions.CosinePair(col("a.v"), col("b.v"))
          .as("cos_sim"))
      .filter(col("cos_sim").isNotNull)
    // bounded per-(cell,src) top-k — map-side discard instead of a
    // full sort of every cell's pair fan-out (GroupTopK's tie rule,
    // ord DESC / key ASC, IS the (cos desc, dst asc) contract)
    GroupTopK.topKPerGroup(pairs, Seq("cell", "src"), "cos_sim",
        "dst", k)
      .select(col("cell"), col("src"), col("key").as("dst"),
        col("rank").as("knn_rank"), col("ord").as("cos_sim"))
  }

  /** Embedding COVARIANCE matrix (upper triangle, long form): the
    * second-moment statistic behind whitening, PCA seeding, and
    * anisotropy diagnostics of an embedding column. Emits one row per
    * (i ≤ j) dimension pair: (i, j, n_vecs, cov_nano).
    *
    * Scale shape — NO JOIN and NO EXPLODE over the data: the native
    * [[graft.functions.GramAgg]] aggregate accumulates count, element
    * sums, and the outer-product triangle in ONE primitive long[]
    * buffer per partition (≈17 KB at d=64) and merges partials by
    * elementwise add — rows × dim²/2 multiply-adds, the FLOPs any
    * covariance needs, with a shuffle of numPartitions buffers. (The
    * expression-form alternative — nested transform/flatten/explode —
    * measured ~4.5× slower at sf0.1: Spark's higher-order functions
    * evaluate interpreted per element and materialize rows×dim²/2
    * intermediate rows.)
    *
    * Exactness discipline: elements quantize to the 1e4 grid as int64
    * BEFORE multiplying, so every partial sum is an integer (order-free
    * across engines); the covariance then derives from those integers
    * in one fixed-order double expression onto the nano grid. Int64
    * headroom: |q| ≤ 1e4·|x|; unit-norm-ish vectors (|x| ≤ 1) give
    * per-row products ≤ 1e8, overflowing past ~9e10 rows — two orders
    * beyond a 100 TB corpus of 64-dim float vectors (~4e11 bytes/row⁻¹
    * ⇒ ~4e11 rows would need ~1e14 B); for wider margins shard the agg
    * by a row-hash and sum the shards' int64 partials as decimals.
    */
  /** Dominant embedding direction by INTEGER power iteration over the
    * [[embedCovariance]] matrix, plus the projection of every vector
    * onto it — the anisotropy diagnostic a pipeline runs before
    * deciding whether embeddings need whitening, and the "most extreme
    * documents along PC1" drill-down when they do.
    *
    * Determinism discipline: the iteration runs entirely on integer
    * grids — v stays on the 1e6 grid, each matvec is an exact int64
    * sum of cov_nano·v_micro products, and the ∞-norm renormalization
    * is integer division (truncating in both Spark/Java and DuckDB,
    * pinned by the oracle-environment probe) — so all `iters` rounds
    * replay bit-for-bit in any engine. The per-iteration λ estimate
    * (Σ|Cv| / Σ|v|, emitted for the last two rounds) doubles as the
    * convergence trace: on an isotropic corpus (tiny spectral gap —
    * exactly what this synthetic testdata has) the two stay close to
    * trace/d and the direction estimate is honest noise; on a real
    * anisotropic embedding table λ₁ separates and v converges at the
    * gap rate. λ and trace land in fixed-grid columns so the "is this
    * space isotropic" read IS the query output.
    *
    * Scale shape: the covariance collect is the bounded-statistic
    * pattern (dim² int64 rows — the IVF-centroid precedent), the
    * iteration is driver-side on a ≤dim² int matrix (microseconds),
    * and the projection is one scan with the direction folded in as a
    * literal — no shuffle beyond [[embedCovariance]]'s own partials.
    */
  def embedPcaExtremes(df: DataFrame, idCol: String, vecCol: String,
      iters: Int = 16, k: Int = 20): DataFrame = {
    val cov = embedCovariance(df, vecCol)
      .select("i", "j", "cov_nano").collect()
    val d = cov.map(_.getInt(1)).max + 1
    val c = Array.ofDim[Long](d, d)
    cov.foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getLong(2))
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(d)(1000000L)
    var lam = 0L
    var lamPrev = 0L
    for (_ <- 1 to iters) {
      val cv = Array.tabulate(d) { i =>
        var s = 0L; var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      val m = cv.map(math.abs).max
      lamPrev = lam
      // λ = (Σ|Cv|/1e15) / (Σ|v|/1e6) on the micro grid — a pure
      // integer ratio of two order-free sums
      lam = cv.map(math.abs).sum / (v.map(math.abs).sum * 1000L)
      v = cv.map(_ / (m / 1000000L + 1L))
    }
    val traceNano = (0 until d).map(i => c(i)(i)).sum
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * 1e4).cast("long"))
    val vArr = array(v.map(lit).toIndexedSeq: _*)
    df.select(col(idCol),
        aggregate(zip_with(q, vArr, (a, b) => a * b), lit(0L),
          (acc, x) => acc + x).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .withColumn("lambda_micro", lit(lam))
      .withColumn("lambda_prev_micro", lit(lamPrev))
      .withColumn("trace_nano", lit(traceNano))
  }

  def embedCovariance(df: DataFrame, vecCol: String): DataFrame =
    df.agg(graft.functions.GramAgg(col(vecCol), 1e4).as("g"))
      .select(inline(col("g")))
      .withColumn("cov_nano",
        floor((col("sxy").cast("double") /
            (col("n").cast("double") * 1e8) -
          (col("si").cast("double") / (col("n").cast("double") * 1e4)) *
            (col("sj").cast("double") / (col("n").cast("double") * 1e4)))
          * 1e9).cast("long"))
      .select(col("i"), col("j"), col("n").as("n_vecs"), col("cov_nano"))

  /** Distributed Lloyd's k-means over an embedding column, exact on
    * the 1e4 integer grid — the clustering primitive under IVF cell
    * assignment, semantic sharding, and diversity-aware sampling,
    * here as a first-class distributed loop (the private
    * [[kmeansFit]] fits driver-side over a bounded SAMPLE; this one
    * never materializes the vectors).
    *
    * Determinism/exactness: vectors quantize onto the 1e4 grid once;
    * squared distances are int64; centroid updates are
    * floor(sum/count) with the sums exact in doubles (≤2⁵³); ties in
    * the argmin break toward the lower centroid id. Init is the k
    * lowest-id vectors. Every quantity is therefore plan-order-free
    * and a DuckDB CTE chain replays all rounds bit-for-bit.
    *
    * Scale shape: each round is ONE scan-local assignment (k distance
    * expressions over broadcast centroid LITERALS — whole-stage
    * codegen, no shuffle, no join) plus ONE map-side-combined
    * (cid, pos) aggregate whose k×d result is a bounded driver-side
    * collect (the q_ntile blessed shape: k·d ≤ a few thousand cells
    * regardless of corpus size). R rounds = R scans; nothing ever
    * shuffles the vectors themselves.
    */
  /** Quantize an embedding column onto the 1e4 integer grid as
    * (id, q: array<long>) — the shared front of the exact-integer
    * clustering/eval operators.
    */
  private def quantize1e4(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long")).as("q"))

  /** Exact int64 squared distance between the grid column `q` and a
    * literal centroid/anchor vector — expression-only, codegen'd.
    */
  private def d2ToLiteral(c: Array[Long]): Column = {
    val carr = array(c.map(lit).toIndexedSeq: _*)
    aggregate(zip_with(col("q"), carr, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
  }

  // argmin over k centroid literals: least() over (d2, cid) structs
  // compares lexicographically, so equal distances break to the
  // lower cid — the same (d2, cid) order the oracle's row_number uses
  private def lloydAssignCol(cs: Array[Array[Long]]): Column =
    least(cs.zipWithIndex.map { case (c, i) =>
      struct(d2ToLiteral(c).as("d2"), lit(i).as("cid"))
    }.toIndexedSeq: _*).getField("cid")

  /** The Lloyd rounds shared by [[kmeansLloyd]] and
    * [[kmeansSilhouette]]: init from the k lowest-id vectors, then
    * `iters` rounds of (scan-local argmin assignment, one
    * map-side-combined (cid, pos) aggregate, floor-of-mean update,
    * empty-cluster carry-forward). `q` is [[quantize1e4]] output.
    */
  private def lloydCentroids(q: DataFrame, k: Int,
      iters: Int): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = q.orderBy("id").limit(k).collect()
      .map(_.getSeq[Long](1).toArray)
    for (_ <- 1 to iters) {
      val upd = q.withColumn("cid", lloydAssignCol(cents))
        .select(col("cid"), posexplode(col("q")))
        .groupBy("cid", "pos")
        .agg(sum("col").as("sv"), count(lit(1)).as("nv"))
        .collect()
      // empty clusters keep their previous centroid (both sides agree:
      // the oracle LEFT JOINs new means onto the previous round)
      val next = cents.map(_.clone)
      upd.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
      }
      cents = next
    }
    cents
  }

  def kmeansLloyd(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 4): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField,
      IntegerType, LongType}
    val q = quantize1e4(df, idCol, vecCol)
    val cents = lloydCentroids(q, k, iters)
    val d = cents(0).length
    val centRows: Seq[org.apache.spark.sql.Row] =
      for { cid <- 0 until k; pos <- 0 until d }
        yield org.apache.spark.sql.Row(cid, pos, cents(cid)(pos))
    val centDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(centRows: _*),
      StructType(Seq(StructField("cid", IntegerType, nullable = false),
        StructField("pos", IntegerType, nullable = false),
        StructField("c_q", LongType, nullable = false))))
    val sizes = q.withColumn("cid", lloydAssignCol(cents))
      .groupBy("cid").agg(count(lit(1)).as("n_vecs"))
    centDf.join(broadcast(sizes), Seq("cid"))
      .select("cid", "pos", "c_q", "n_vecs")
  }

  /** Per-cluster SILHOUETTE profile of a [[kmeansLloyd]] fit — the
    * cluster-quality read a curation pipeline takes before trusting a
    * semantic sharding or IVF layout: the centroid-based (simplified)
    * silhouette s = (b − a) / max(a, b), with a = squared distance to
    * the OWN (argmin) centroid and b = the nearest OTHER centroid, so
    * a ≤ b always and s ∈ [0, 1] (0 = on a cluster boundary).
    * Everything stays exact-integer: distances are int64 on the 1e4
    * grid, s is kept in micro units via truncating division (b−a ≥ 0,
    * so truncation ≡ floor in every engine), and the per-cluster mean
    * is an integer floor-of-sum — any engine replays it bit-for-bit.
    *
    * Scale shape: re-runs the Lloyd rounds (each one scan + one
    * bounded k×d aggregate), then ONE more scan computing all k
    * distances per row from broadcast centroid literals (scan-local,
    * codegen) and ONE map-side-combined groupBy over k cluster ids.
    * Nothing all-pairs: the classic silhouette's pairwise-distance b
    * is replaced by the centroid surrogate exactly so 100 TB stays
    * one linear pass.
    */
  def kmeansSilhouette(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iters: Int = 4): DataFrame = {
    val q = quantize1e4(df, idCol, vecCol)
    val cents = lloydCentroids(q, k, iters)
    val ds = array(cents.zipWithIndex.map { case (c, i) =>
      struct(d2ToLiteral(c).as("d2"), lit(i).as("cid"))
    }.toIndexedSeq: _*)
    q.withColumn("ds", ds)
      .withColumn("own", array_min(col("ds")))
      .select(col("own").getField("cid").as("cid"),
        col("own").getField("d2").as("a"),
        array_min(filter(col("ds"),
            s => s.getField("cid") =!= col("own").getField("cid")))
          .getField("d2").as("b"))
      .withColumn("s_micro",
        expr("(b - a) * 1000000L div greatest(a, b, 1L)"))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(s_micro) div count(1)").as("mean_s_micro"),
        min("s_micro").as("min_s_micro"),
        max("s_micro").as("max_s_micro"))
  }

  /** Scan-local assignment counts of an embedding column against a
    * STATIC centroid panel (a [[kmeansLloyd]] fit): one codegen'd
    * argmin over broadcast centroid literals + one map-side-combined
    * count per cluster id — the batch twin of the streaming
    * cluster-population monitor
    * ([[graft.streaming.Ingest.kmeansAssignStream]]), and the cheap
    * "did the data drift off my shard layout" probe. Counts are
    * MERGEABLE (plain integer sums), so per-batch rows reconstruct
    * any window downstream with one groupBy-sum.
    */
  def assignCounts(df: DataFrame, vecCol: String,
      centroids: Array[Array[Long]]): DataFrame =
    df.select(transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long")).as("q"))
      .withColumn("cid", lloydAssignCol(centroids))
      .groupBy("cid").agg(count(lit(1)).as("n"))

  /** Exact nearest-neighbor RANK LIST for one query id: integer grid
    * distances to the query's own vector (a 1-row bounded collect
    * turned literal), TakeOrdered top-`topN`, ranks 1..topN by the
    * deterministic (d2, id) order. The window rides UNDER a literal
    * GlobalLimit, so its single task sees a scale-constant row count
    * (the q_zipf_fit blessed shape). Feed for [[rrfFuse]].
    */
  def nearestRank(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = quantize1e4(df, idCol, vecCol)
    val qv = q.filter(col("id") === queryId).head().getSeq[Long](1)
      .toArray
    q.select(col("id"), d2ToLiteral(qv).as("d2"))
      .orderBy(col("d2").asc, col("id").asc).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("d2").asc, col("id").asc)).cast("long"))
      .select(col("id"), col("rank"), col("d2"))
  }

  /** RECIPROCAL-RANK FUSION (Cormack/Clarke/Buettcher) of two rank
    * lists — the standard hybrid-retrieval merge (keyword BM25 ×
    * vector ANN) that needs no score calibration because it only
    * consumes RANKS: rrf(d) = Σ_lists 1/(k + rank_d). Kept exact on
    * the nano grid via pure integer division (1e9 div (k + rank) —
    * no ln, no float), missing-side contributions are 0, so any
    * engine replays the fusion bit-for-bit. Inputs are (idCol, rank)
    * lists (bounded top-N feeds); the join of two bounded lists
    * broadcasts at any corpus scale.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
      kConst: Long = 60L): DataFrame = {
    val fa = a.select(col(idCol), col("rank").as("rank_a"))
    val fb = b.select(col(idCol), col("rank").as("rank_b"))
    fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("rrf_nano",
        coalesce(expr(s"1000000000L div (${kConst}L + rank_a)"),
          lit(0L)) +
        coalesce(expr(s"1000000000L div (${kConst}L + rank_b)"),
          lit(0L)))
  }

  /** Greedy K-CENTER (farthest-point) SAMPLING — the
    * coverage-maximizing coreset selector a training-data pipeline
    * uses to pick k exemplars that span the embedding space (the
    * 2-approximation of the k-center objective): seed with the
    * lowest id, then repeatedly take the point FARTHEST from the
    * selected set. Unlike [[mmrDiversify]] (greedy over a bounded
    * relevance pool), every pick argmaxes over the WHOLE corpus —
    * each round is one scan computing min-distance-to-selected from
    * ≤k centroid literals (codegen, no join) plus one distributed
    * TakeOrdered(1); k rounds = k scans, nothing all-pairs. Exact
    * integer distances with the (distance desc, id) tie-break, so any
    * engine replays every pick; `d2_cover` of pick r is the cover
    * radius the first r−1 centers achieved (the k-center objective
    * trace).
    */
  def kCenterSample(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField,
      IntegerType, LongType}
    val q = quantize1e4(df, idCol, vecCol)
    val first = q.orderBy("id").limit(1).head()
    val sel = scala.collection.mutable.ArrayBuffer[(Long, Array[Long],
      Long)]((first.getLong(0), first.getSeq[Long](1).toArray, 0L))
    for (_ <- 2 to k) {
      // least() needs ≥2 args; one selected center is just its d2
      val md =
        if (sel.size == 1) d2ToLiteral(sel.head._2)
        else least(sel.map { case (_, v, _) => d2ToLiteral(v) }
          .toIndexedSeq: _*)
      val picked = q
        .filter(!col("id").isin(sel.map(_._1).toSeq: _*))
        .select(col("id"), col("q"), md.as("md"))
        .orderBy(col("md").desc, col("id").asc).limit(1)
        .head()
      sel += ((picked.getLong(0), picked.getSeq[Long](1).toArray,
        picked.getLong(2)))
    }
    val rows: Seq[org.apache.spark.sql.Row] =
      sel.zipWithIndex.map { case ((id, _, md), i) =>
        org.apache.spark.sql.Row(i + 1, id, md)
      }.toSeq
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("sel_rank", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("d2_cover", LongType, nullable = false))))
  }

  /** MAXIMAL MARGINAL RELEVANCE (Carbonell/Goldstein) diversified
    * top-k: greedily re-rank a relevance pool so each pick maximizes
    * λ·relevance − (1−λ)·nearest-selected similarity — the
    * diversification pass a retrieval pipeline runs between ANN and
    * the consumer so the k results aren't k near-duplicates. Exact
    * integer form: grid distances stand in for both terms (minimize
    * λ·d2_query − (1000−λ)·min-distance-to-selected, milli-λ), ties
    * break to the lower id, so any engine replays every pick.
    *
    * Scale shape: ONE distributed TakeOrdered builds the `poolN`
    * candidate pool (the only data-sized work); the greedy loop runs
    * driver-side over the BOUNDED pool (k·poolN distance pairs — the
    * PQ-codebook/bounded-collect pattern). Returns (sel_rank, id,
    * d2_q) for the k picks.
    */
  def mmrDiversify(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, poolN: Int = 50, k: Int = 10,
      lambdaMilli: Long = 700L): DataFrame = {
    import org.apache.spark.sql.types.{StructType, StructField,
      IntegerType, LongType}
    val q = quantize1e4(df, idCol, vecCol)
    val qv = q.filter(col("id") === queryId).head().getSeq[Long](1)
      .toArray
    val pool = q.filter(col("id") =!= queryId)
      .select(col("id"), col("q"), d2ToLiteral(qv).as("d2q"))
      .orderBy(col("d2q").asc, col("id").asc).limit(poolN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val selected =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long], Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.length < math.min(k, pool.length)) {
      // minimize λ·d2q − (1000−λ)·minDistToSelected ≡ maximize the
      // MMR objective; round 1 has no diversity term
      val best = remaining.minBy { case (id, v, d2q) =>
        val md =
          if (selected.isEmpty) 0L
          else selected.iterator.map(s => d2(v, s._2)).min
        (lambdaMilli * d2q - (1000L - lambdaMilli) * md, id)
      }
      selected += best
      remaining -= best
    }
    val rows: Seq[org.apache.spark.sql.Row] =
      selected.zipWithIndex.map { case ((id, _, d2q), i) =>
        org.apache.spark.sql.Row(i + 1, id, d2q)
      }.toSeq
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("sel_rank", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("d2_q", LongType, nullable = false))))
  }

  /** Cell-based (grid) DBSCAN over the first two embedding
    * coordinates — the density-clustering read ("how many dense
    * regions, how much noise") a curation pipeline takes on a 2-D
    * projection of the corpus (a JL/PCA projection upstream; here the
    * leading coordinates). The classic scale trick replaces the
    * all-pairs ε-neighborhood with fixed cells: quantize onto the 1e4
    * grid, shift non-negative (so truncating division IS floor
    * division in every engine), bucket into `cellWidth`-wide cells,
    * call a cell DENSE when it holds ≥ `minPts` points, connect dense
    * cells adjacent in the 8-neighborhood (self-offset included, so
    * an isolated dense cell survives as a singleton cluster), and
    * label clusters by min-label connected components
    * ([[Dedup.connectedComponents]]). Points in sparse cells are
    * noise. Output: one row per cluster (comp = min cell key,
    * n_cells, n_pts) plus one comp = −1 noise row — all-integer, so
    * any engine replays it exactly.
    *
    * Scale shape: two keyed aggregations over the points, a 9-way
    * literal-offset explode over the (data-reduced) dense-cell table
    * for adjacency, the CC fixpoint over the CELL graph (orders of
    * magnitude smaller than the point set), and one labeling join.
    * Nothing all-pairs over points; the ε-join never happens.
    */
  def dbscanGrid(df: DataFrame, idCol: String, vecCol: String,
      cellWidth: Long = 2000L, minPts: Long = 8L): DataFrame = {
    val pts = df.select(col(idCol).as("id"),
        (floor(element_at(col(vecCol), 1).cast("double") * 1e4)
          .cast("long") + 100000L).as("gx"),
        (floor(element_at(col(vecCol), 2).cast("double") * 1e4)
          .cast("long") + 100000L).as("gy"))
      .select(col("id"),
        expr(s"gx div ${cellWidth}L").as("cx"),
        expr(s"gy div ${cellWidth}L").as("cy"))
      .withColumn("ck", expr("cx * 100000L + cy"))
    val dense = pts.groupBy("cx", "cy", "ck")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minPts)
    val offsets = for { dx <- -1 to 1; dy <- -1 to 1 } yield (dx, dy)
    val probes = dense.select(col("ck").as("ck_a"),
      explode(array(offsets.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
      }.toIndexedSeq: _*)).as("o"))
      .select(col("ck_a"), col("o.cx").as("cx"), col("o.cy").as("cy"))
    val edges = probes
      .join(dense.select(col("cx"), col("cy"), col("ck").as("ck_b")),
        Seq("cx", "cy"))
      .filter(col("ck_a") <= col("ck_b"))
      .select("ck_a", "ck_b")
    val labels = Dedup.connectedComponents(edges, "ck_a", "ck_b")
      .select(col("id").as("ck"), col("comp"))
    val labeled = pts.join(labels, Seq("ck"))
    val clusters = labeled.groupBy("comp")
      .agg(countDistinct(col("ck")).as("n_cells"),
        count(lit(1)).as("n_pts"))
    val noise = pts.join(labels.select("ck"), Seq("ck"), "left_anti")
      .agg(countDistinct(col("ck")).as("n_cells"),
        count(lit(1)).as("n_pts"))
      .select(lit(-1L).as("comp"), col("n_cells"), col("n_pts"))
    clusters.unionAll(noise)
  }

  /** External cluster validation of a [[kmeansLloyd]] fit against a
    * label column: per-cluster PURITY — the majority label, its
    * count, and count/size in exact micro units (ties break to the
    * lower label) — the "do my semantic shards mean anything"
    * check run against whatever supervision exists. All-integer, so
    * any engine replays it; complements [[kmeansSilhouette]] (internal
    * geometry) with external agreement.
    *
    * Scale shape: the Lloyd rounds plus ONE scan-local assignment
    * from broadcast centroid literals and two map-side-combined
    * aggregations over (cluster, label) — at most k·|labels| groups.
    */
  def kmeansPurity(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 4, iters: Int = 4): DataFrame = {
    val labeled = df.select(col(idCol).as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long")).as("q"),
      col(labelCol).cast("int").as("label"))
    val cents = lloydCentroids(labeled.select("id", "q"), k, iters)
    labeled.withColumn("cid", lloydAssignCol(cents))
      .groupBy("cid", "label").agg(count(lit(1)).as("n"))
      .groupBy("cid")
      .agg(sum("n").as("n_vecs"),
        // majority label, ties to the LOWER label: max over
        // (count, −label) structs
        max(struct(col("n").as("n"),
          (-col("label")).as("neg_label"))).as("m"))
      .select(col("cid"), col("n_vecs"),
        (-col("m").getField("neg_label")).as("maj_label"),
        col("m").getField("n").as("n_maj"),
        expr("m.n * 1000000L div n_vecs").as("purity_micro"))
  }

  /** HARD-NEGATIVE MINING for contrastive training: for each of a
    * bounded panel of anchor vectors, the exact nearest example with
    * a DIFFERENT label — the "hardest wrong answer" a triplet/InfoNCE
    * pipeline pairs with each anchor. Exact by construction (no
    * blocking loss): the anchor panel is collected once (`nAnchors`
    * rows — a fixed-size literal table, the PQ-codebook pattern), and
    * every candidate row computes its distance to ALL anchors
    * scan-local from literals, keeps only wrong-label pairs, and a
    * single map-side-combined min-of-struct per anchor picks the
    * winner with the deterministic (d2, id) tie-break. Integer grid
    * end-to-end.
    *
    * Scale shape: one scan with an `nAnchors`-way explode (linear,
    * constant factor = panel size) + one aggregate over `nAnchors`
    * groups; no join, no shuffle of vectors, no BroadcastNestedLoop.
    * At 100 TB the panel stays driver-bounded and the scan is
    * embarrassingly parallel.
    */
  private def anchorNearest(df: DataFrame, idCol: String,
      vecCol: String, labelCol: String, nAnchors: Int,
      sameLabel: Boolean): DataFrame = {
    val q = df.select(col(idCol).as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * 1e4).cast("long")).as("q"),
      col(labelCol).cast("int").as("label"))
    // bounded driver collect: the anchor panel is a fixed-size literal
    val anchors = q.orderBy("id").limit(nAnchors).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getInt(2)))
    val pairs = array(anchors.map { case (aid, av, alab) =>
      struct(lit(aid).as("aid"), lit(alab).as("alabel"),
        d2ToLiteral(av).as("d2"))
    }.toIndexedSeq: _*)
    val keep =
      if (sameLabel)
        col("p.alabel") === col("label") && col("p.aid") =!= col("id")
      else col("p.alabel") =!= col("label")
    q.select(explode(pairs).as("p"), col("id"), col("label"))
      .filter(keep)
      .groupBy(col("p.aid").as("anchor_id"),
        col("p.alabel").as("anchor_label"))
      .agg(min(struct(col("p.d2").as("d2"), col("id").as("id"),
          col("label").as("label"))).as("m"),
        count(lit(1)).as("n_cand"))
      .select(col("anchor_id"), col("anchor_label"),
        col("m").getField("id").as("match_id"),
        col("m").getField("label").as("match_label"),
        col("m").getField("d2").as("d2_q"),
        col("n_cand"))
  }

  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nAnchors: Int = 16): DataFrame =
    anchorNearest(df, idCol, vecCol, labelCol, nAnchors,
        sameLabel = false)
      .withColumnRenamed("match_id", "neg_id")
      .withColumnRenamed("match_label", "neg_label")

  /** The positive half of contrastive-pair mining: for each anchor,
    * the exact nearest OTHER example with the SAME label (self
    * excluded) — the in-batch positive a triplet/InfoNCE pipeline
    * pairs with [[hardNegatives]]' hardest wrong answer. Same
    * scan-local literal-panel shape, exact integer distances,
    * (d2, id) tie-break.
    */
  def hardPositives(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, nAnchors: Int = 16): DataFrame =
    anchorNearest(df, idCol, vecCol, labelCol, nAnchors,
        sameLabel = true)
      .withColumnRenamed("match_id", "pos_id")
      .withColumnRenamed("match_label", "pos_label")
}
