package graft.etl

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of a materialized JOIN view — the join
  * counterpart of [[IncrementalAgg]] (which maintains aggregates).
  *
  * For insert-only deltas the relational delta rule is exact:
  *
  *   (A₀ ∪ ΔA) ⋈ (B₀ ∪ ΔB)  =  A₀⋈B₀  ∪  ΔA⋈B₀  ∪  A₀⋈ΔB  ∪  ΔA⋈ΔB
  *
  * so a view materialized as A₀⋈B₀ advances by computing only the three
  * delta terms — each sized by |Δ|, never |A|·|B|. At 100 TB this is the
  * difference between re-joining two fact histories on every load and
  * probing the arriving partitions against key-bucketed bases: with A
  * and B bucketed on the join key (operators/Bucketing), every delta
  * term is a co-located probe of |Δ| rows and the full recompute never
  * runs. The reference refreshes its gold joins by full
  * truncate-and-reload (scripts/gold/ddl_gold.sql views re-scan silver
  * whole); this is the incremental form of the same contract.
  *
  * Deletes/updates extend the same algebra with a retraction stream
  * (negative multiplicities); the warehouse's SCD paths (etl/Scd) handle
  * those by key-merge instead, so this operator stays insert-only — the
  * fact-append case that dominates volume.
  */
object JoinIvm {

  /** The three delta terms for an insert-only advance of A ⋈ B
    * (inner equi-join on `keys`). Inputs must share the view's column
    * contract: `a0`/`da` one schema, `b0`/`db` another, overlapping only
    * in `keys`. */
  def deltaRows(a0: DataFrame, da: DataFrame, b0: DataFrame, db: DataFrame,
                keys: Seq[String]): DataFrame =
    da.join(b0, keys)
      .unionByName(a0.join(db, keys))
      .unionByName(da.join(db, keys))

  /** Advance the materialized view `base` (= A₀⋈B₀) by the delta rule;
    * the result equals (A₀∪ΔA) ⋈ (B₀∪ΔB) row-for-row. */
  def maintain(base: DataFrame, a0: DataFrame, da: DataFrame,
               b0: DataFrame, db: DataFrame, keys: Seq[String]): DataFrame =
    base.unionByName(deltaRows(a0, da, b0, db, keys))
}
