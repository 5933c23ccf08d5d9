package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked probabilistic record linkage — the Fellegi–Sunter shape
  * (Fellegi & Sunter 1969, "A Theory for Record Linkage", JASA; the
  * standard entity-resolution model): candidate pairs come from
  * equality BLOCKING keys, each field comparison contributes an
  * integer agreement weight, and a pair links when the summed score
  * clears a threshold.
  *
  * Scale shape (the whole point of blocking): the join is a plain
  * equi-join on the block keys, so candidate volume is Σ_cells
  * |L_cell|·|R_cell| — never |L|×|R| — and Catalyst picks
  * broadcast/sort-merge per side sizes like any other join. Weights
  * and the threshold are INTEGERS (match probabilities folded into
  * fixed agreement weights), so scoring is codegen'd integer
  * arithmetic and the decision replays exactly in any engine — no
  * floating-point match scores to drift. At 100 TB: block keys are
  * chosen so cells stay bounded (add a key or salt a hot cell the
  * same way a skewed join is salted), and a multi-pass OR-blocking
  * union catches pairs a single key misses — each pass is this same
  * operator.
  */
object Linkage {
  /** Pairs `left` and `right` rows sharing every block key, scores
    * each pair with `score` (build it from `l`/`r`-qualified columns;
    * sum of integer agreement weights), and keeps pairs scoring at or
    * above `threshold`. The caller's score expression decides the
    * field-comparison semantics (exact, banded numeric, prefix, …).
    * Emits the selected `out` columns plus `link_score`.
    */
  def blockedLinkage(left: DataFrame, right: DataFrame,
      blockLeft: Seq[String], blockRight: Seq[String],
      score: Column, threshold: Long, out: Seq[Column]): DataFrame = {
    require(blockLeft.length == blockRight.length && blockLeft.nonEmpty,
      "one right block key per left block key")
    val cond = blockLeft.zip(blockRight)
      .map { case (a, b) => col(s"l.$a") === col(s"r.$b") }
      .reduce(_ && _)
    left.as("l").join(right.as("r"), cond)
      .withColumn("link_score", score)
      .filter(col("link_score") >= threshold)
      .select(out :+ col("link_score"): _*)
  }
}
