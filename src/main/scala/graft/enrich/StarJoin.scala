package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Star-schema enrichment: fact inner-equi-joined to its dimensions with
  * explicit broadcast of the small sides
  * (reference: src/main/transformations/jobs/dimension_tables_join.py:17-54).
  *
  * Divergence (intentional, SURVEY.md §7.5a): the reference drops
  * post-join duplicates with string-qualified names like
  * `drop("s3_data.customer_id")`, which are silent no-ops in Spark — its
  * actual output carries duplicate columns. We implement the INTENT with
  * `Column`-based drops so each join key appears once.
  *
  * Scale notes: dimension tables are broadcast explicitly — a fact table of
  * any size joins with zero shuffle (BroadcastHashJoin; asserted in
  * ExplainSpec). If a dimension ever outgrows the broadcast threshold,
  * removing the hint falls back to a shuffled hash join keyed on the fact's
  * join column; AQE picks the strategy at runtime.
  */
object StarJoin {

  /** Inner equi-join `fact` to a broadcast dimension, dropping the
    * dimension-side key (one clean key column out). */
  def joinDim(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "inner")
      .drop(dim(dimKey))

  /** lineitem enriched through supplier -> nation -> region — the testdata
    * analogue of the reference's fact->customer->store->sales_team chain. */
  def enrichLineitem(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, region: DataFrame): DataFrame = {
    val s = joinDim(lineitem, supplier, "l_suppkey", "s_suppkey")
    val n = joinDim(s, nation, "s_nationkey", "n_nationkey")
    joinDim(n, region, "n_regionkey", "r_regionkey")
  }
}
