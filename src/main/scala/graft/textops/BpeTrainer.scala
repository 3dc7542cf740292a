package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-driven BPE merge-table TRAINING (Sennrich et al., ACL'16) —
  * the vocab-build half that [[graft.functions.BpeMerges]]'s committed
  * table only snapshots. Standard BPE-on-vocab formulation: the corpus
  * reduces once to (distinct word, frequency) — Heaps' law keeps that
  * sublinear — and each round counts adjacent token pairs weighted by
  * word frequency, merges the argmax pair everywhere, and re-counts.
  *
  * Distributed shape: pair counting is one exploded groupBy over the
  * vocab per round; ONLY the single argmax row is collected per round
  * (domain-bounded, like ANN centroids), and the merge is a pure
  * per-row array projection against that literal — no crossJoin, no
  * vocab collect. The vocab localCheckpoints each round so the 48-deep
  * projection chain never accumulates as lineage.
  *
  * Determinism contract with the DuckDB oracle replay:
  *  - argmax ties break on (count DESC, a ASC, b ASC) — pure-ASCII
  *    tokens (post-normText), so both engines order identically;
  *  - pairs with a == b are EXCLUDED from training (the committed
  *    table's invariant): with unequal sides, one merge round's
  *    occurrences can never overlap, which keeps both the oracle's
  *    positional replay and the per-round array merge here sound;
  *  - the merge is boundary-aware (token-array positional fuse), never
  *    a space-joined string replace — at 48 rounds merged symbols share
  *    affixes and a textual replace would cross token boundaries.
  */
object BpeTrainer {

  /** Train up to `rounds` merge rules from the corpus; stops early if
    * no repeated pair remains. Returns rules in rank order, ready for
    * [[graft.functions.BpeSegmentWith]]. */
  def train(df: DataFrame, textCol: String, rounds: Int): Seq[(String, String)] = {
    var vocab = df
      .select(explode(split(TextFunctions.normText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"), split(col("w"), "").as("tk"), col("f"))
      .localCheckpoint(true)
    val rules = Seq.newBuilder[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val len = greatest(size(col("tk")) - 1, lit(0))
      val top = vocab
        .select(col("f"), explode(arrays_zip(
          slice(col("tk"), lit(1), len).as("a"),
          slice(col("tk"), lit(2), len).as("b"))).as("pr"))
        .select(col("f"), col("pr.a").as("a"), col("pr.b").as("b"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        rules += ((a, b))
        vocab = vocab
          .select(col("w"), mergePair(col("tk"), a, b).as("tk"), col("f"))
        // cut lineage every few rounds, not every round: each merge is
        // one cheap array projection, so a short pending chain costs
        // nothing to re-plan, while a per-round EAGER checkpoint is a
        // full extra job — at 48 rounds that halves the loop's job
        // count (next round's argmax collect materializes the chain)
        if ((r + 1) % 4 == 0) vocab = vocab.localCheckpoint(true)
        r += 1
      }
    }
    rules.result()
  }

  /** Boundary-aware all-occurrence left-to-right fuse of (a, b) in a
    * token array — the same positional form the oracle replays: a
    * position starts a merge if it is `a` followed by `b`; the position
    * after a start is consumed. Sound because a != b (a consumed `b`'s
    * predecessor is always a genuine start — it cannot itself have been
    * consumed, since that would need tk[i-1] == b == a). Guards are
    * ordered so element_at never sees an out-of-range index (ANSI-safe
    * short-circuit). */
  private def mergePair(tk: Column, a: String, b: String): Column = {
    val n = size(tk)
    filter(
      transform(tk, (x, i) =>
        when(i < n - 1 &&
             element_at(tk, i + 1) === lit(a) &&
             element_at(tk, i + 2) === lit(b), lit(a + b))
        .when(i > 0 &&
             element_at(tk, i) === lit(a) &&
             element_at(tk, i + 1) === lit(b), lit(null))
        .otherwise(x)),
      x => x.isNotNull)
  }
}
