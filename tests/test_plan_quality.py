"""Plan-shape regression tests: the 100 TB guarantees, asserted.

Each test pins a physical-plan property a refactor could silently lose:
predicate pushdown into the parquet scan, column pruning, broadcast of
dimension tables, TakeOrderedAndProject for top-k, and no Python
evaluation nodes in relational hot paths.
"""

from __future__ import annotations

import pytest

from logvision_spark.catalog import CATALOG
from logvision_spark.plans.checks import plan_features


@pytest.fixture(scope="module")
def feats(spark, sf_dir):
    def get(name):
        return plan_features(CATALOG[name].builder(spark, sf_dir))

    return get


def test_q1_pushdown_and_partial_agg(feats):
    f = feats("q1_pricing_summary")
    assert any("l_shipdate" in p for p in f.pushed_filters)
    assert f.hash_aggregates >= 2  # partial + final
    assert not f.python_eval


def test_q3_broadcasts_dims_and_takes_ordered(feats):
    f = feats("q3_shipping_priority")
    assert f.take_ordered  # top-10 must not global-sort
    assert f.broadcast_joins + f.sort_merge_joins >= 2
    assert any("BUILDING" in p for p in f.pushed_filters)  # filter reached scan
    assert not f.python_eval


def test_q5_star_join_broadcasts(feats):
    f = feats("q5_nation_revenue")
    assert f.broadcast_joins >= 2  # nation/region at minimum
    assert any("ASIA" in p for p in f.pushed_filters)


def test_k2_take_ordered_single_column_scan(feats):
    f = feats("k2_top14_users")
    assert f.take_ordered
    assert f.reads_only("user_id")  # column pruning: one column off disk


def test_j3_enrichment_is_broadcast(feats):
    f = feats("j3_region_enrich")
    assert f.broadcast_joins == 2
    assert f.reads_only("c_nationkey", "c_acctbal", "n_nationkey", "n_regionkey",
                        "r_regionkey", "r_name")


def test_emb_label_counts_prunes_array_column(feats):
    """The 64-float embedding array must NOT be read for a label count."""
    f = feats("emb_label_counts")
    assert f.reads_only("label")


def test_q6_all_predicates_pushed(feats):
    f = feats("q6_forecast_revenue")
    joined = " ".join(f.pushed_filters)
    assert "l_shipdate" in joined and "l_discount" in joined
    assert f.reads_only("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")


def test_q4_plans_semi_join(feats, spark, sf_dir):
    from logvision_spark.catalog import CATALOG
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["q4_order_priority"].builder(spark, sf_dir))
    assert "LeftSemi" in plan  # EXISTS decorrelated, not materialized


def test_asof_join_single_shuffle_no_python(feats, spark, sf_dir):
    from logvision_spark.catalog import CATALOG
    from logvision_spark.plans.checks import explain_str, plan_features

    df = CATALOG["j6_asof_join"].builder(spark, sf_dir)
    f = plan_features(df)
    assert not f.python_eval
    plan = explain_str(df)
    # one hash-partitioned exchange on the key feeds the window sort
    assert plan.count("hashpartitioning(user_id") <= 2
    assert "Window" in plan


def test_no_pinned_broadcast_on_sf_scaling_tables(spark, sf_dir):
    """customer/part/supplier grow linearly with SF — a pinned
    F.broadcast on them bypasses the threshold AND AQE's runtime
    demotion, an OOM at 100×. Only true constants (nation/region splits,
    single-row aggregates) may carry explicit pins. Asserted on the
    analyzed logical plan's hints — the physical plan may still
    legitimately choose broadcast at sf0.1 via the threshold."""
    from logvision_spark.plans.checks import broadcast_hint_count

    expected_pins = {
        "q3_shipping_priority": 0,
        "q7_nation_volume": 2,       # the two nation splits only
        "q14_promo_ratio": 0,
        "q15_top_supplier": 1,       # the single-row max-revenue aggregate
        "q17_small_qty_revenue": 0,
        "q19_disjunctive": 0,
    }
    for name, expected in expected_pins.items():
        got = broadcast_hint_count(CATALOG[name].builder(spark, sf_dir))
        assert got == expected, f"{name}: {got} broadcast pins, want {expected}"


def test_q20_nested_in_plans_as_semi_joins(feats, spark, sf_dir):
    from logvision_spark.plans.checks import explain_str

    df = CATALOG["q20_part_suppliers"].builder(spark, sf_dir)
    plan = explain_str(df)
    assert plan.count("LeftSemi") >= 2  # both IN-subqueries decorrelated
    f = feats("q20_part_suppliers")
    assert any("l_shipdate" in p for p in f.pushed_filters)  # date → scan
    assert not f.python_eval


def test_q21_exists_pair_plans_semi_plus_anti(spark, sf_dir):
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["q21_waiting_suppliers"].builder(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan  # top-20 never global-sorts


def test_q13_left_outer_keeps_zero_count_customers(feats):
    f = feats("q13_order_distribution")
    assert f.hash_aggregates >= 4  # two aggregations, each partial+final
    assert not f.python_eval


def test_q21_agg_variant_halves_lineitem_scans(spark, sf_dir):
    """The EXISTS/NOT-EXISTS plan necessarily scans lineitem 3× (one per
    subquery branch); the aggregation reformulation must stay at ≤2
    (base + per-order stats). This is the scale difference between the
    two registered formulations."""
    from logvision_spark.plans.checks import explain_str

    semi = explain_str(CATALOG["q21_waiting_suppliers"].builder(spark, sf_dir))
    agg = explain_str(CATALOG["q21_waiting_suppliers_agg"].builder(spark, sf_dir))
    assert semi.count("lineitem.parquet") == 3
    assert agg.count("lineitem.parquet") <= 2


def test_sim_near_pairs_lsh_has_no_cross_join(spark, sf_dir):
    """The LSH near-pair variant must candidate via (table, bucket)
    equi-joins — no nested-loop/cartesian all-pairs product anywhere."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["sim_near_pairs_lsh"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_and_drop_list_queries_have_no_cross_join(spark, sf_dir):
    """j8 turns its inequality predicate into a bucket equi-join, and the
    end-to-end drop list candidates via banded equi-joins — neither may
    degrade to a nested-loop/cartesian product."""
    from logvision_spark.plans.checks import explain_str

    for name in ("j8_range_join_incidents", "dedup_drop_list"):
        plan = explain_str(CATALOG[name].builder(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_ivf_batch_probe_joins_corpus_without_shuffle_or_python(spark, sf_dir):
    """The batched IVF probe's only nested-loop join must be the bounded
    queries × centroids crossJoin (≤ |Q|·n_cells rows); the corpus side
    reaches candidates via broadcast-hash joins on cell/q_id — never a
    sort-merge shuffle of the vectors, never a cartesian over the
    corpus, and no Python in the plan."""
    from pyspark.sql import functions as F

    from logvision_spark.operators.similarity import fit_ivf, ivf_topk_batch
    from logvision_spark.plans.checks import explain_str
    from logvision_spark.sources.readers import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    base = emb.where(F.col("vec_id") >= 3)
    model = fit_ivf(base, n_cells=8, seed=42)
    plan = explain_str(ivf_topk_batch(base, qs, k=10, n_cells=8, model=model))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # queries × centroids
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_relational_queries_stay_jvm_side(feats):
    for name in (
        "q1_pricing_summary",
        "a3_count_by_user",
        "dedup_ngram_jaccard",
        "sim_top10_vec0",
        "text_lang_id",
    ):
        assert not feats(name).python_eval, f"{name} fell off codegen into Python"


def test_new_pipeline_queries_stay_jvm_side(feats):
    """The curation/compression/sampling additions are all built-in
    expressions — none may fall into a Python eval node (the only
    deliberate Python in the catalog is the grouped-map fit and the
    multimodal mapInPandas plumbing)."""
    for name in (
        "decontam_ngram_overlap",
        "emb_int8_quantize",
        "corpus_stratified_sample",
        "pack_token_bins",
        "ts_gap_fill",
        "corpus_quality_funnel",
        "sim_topk_batch",
    ):
        assert not feats(name).python_eval, f"{name} fell off codegen into Python"


def test_pack_token_bins_window_is_sharded(spark, sf_dir):
    """The packing window must partition by shard — a global ordered
    window (empty partition spec) serializes the cumulative sum onto a
    single task at scale."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["pack_token_bins"].builder(spark, sf_dir))
    assert "Window" in plan
    assert "partitionBy=[shard" in plan.replace(" ", "").replace("#", "").lower() or (
        "windowspecdefinition(shard" in plan.replace(" ", "").lower()
    ), plan[:2000]


def test_decontam_joins_on_shingles_not_cross(spark, sf_dir):
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["decontam_ngram_overlap"].builder(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_is_single_scan_single_aggregate(spark, sf_dir):
    """The funnel's four stages must come from ONE scan of documents and
    one aggregation tree (partial+final), not four rescans unioned."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["corpus_quality_funnel"].builder(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan[:1500]


def test_analytics_queries_stay_jvm_side(feats):
    for name in (
        "a_conversion_funnel",
        "a_weekly_retention",
        "a_value_decile_histogram",
        "privacy_pseudonymize",
        "profile_columns",
        "dq_expectations",
        "a_latest_event_per_user",
        "layout_zorder_key",
        "j_salted_skew_join",
    ):
        assert not feats(name).python_eval, f"{name} fell off codegen into Python"


def test_profile_uses_expand_not_rescans(spark, sf_dir):
    """Multi-column distinct profiling must plan as ONE scan + Expand,
    not one scan per column."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["profile_columns"].builder(spark, sf_dir))
    assert plan.count("Scan parquet") == 1, plan[:1500]
    assert "Expand" in plan


def test_latest_event_is_single_aggregation_no_window(spark, sf_dir):
    """CDC compaction must plan as hash aggregation (max_by with partial
    combine), never a row_number window over a global sort."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["a_latest_event_per_user"].builder(spark, sf_dir))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_mm_real_codec_entries_single_maparrow_no_exchange(spark, sf_dir):
    """The real-codec entries must stay one MapInArrow over a
    payload-narrow projection: decode adds ZERO exchanges; the histogram
    entry shuffles only its sparse (asset, bucket) aggregate."""
    from logvision_spark.plans.checks import explain_str

    for name, max_exchanges in (
        ("mm_decode_real", 0),
        ("mm_resize_real", 0),
        ("mm_features_real", 1),
    ):
        plan = explain_str(CATALOG[name].builder(spark, sf_dir))
        assert plan.count("MapInArrow") == 1, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        # shuffle exchanges only (broadcast exchanges are free-standing)
        assert plan.count("Exchange hashpartitioning") <= max_exchanges, name


def test_histogram_approx_two_pass_no_python(spark, sf_dir):
    """The approx decile histogram keeps the exact entry's two-pass shape
    (boundary aggregate broadcast into a conditional-bucket count): no
    Python nodes, no sort of the data, value-only scan."""
    f = plan_features(CATALOG["a_value_decile_histogram_approx"].builder(spark, sf_dir))
    assert not f.python_eval
    assert f.hash_aggregates >= 2
    assert all(rs == "value:double" for rs in f.read_schemas if "value" in rs)


def test_lsh_emit_once_has_no_final_distinct_aggregate(spark, sf_dir):
    """Emit-once LSH emits each pair in exactly one table, so the plan
    must NOT contain a distinct (HashAggregate over id_a,id_b,cos_sim)
    above the verify filter — the output shuffle the refinement removed."""
    from logvision_spark.plans.checks import explain_str

    from logvision_spark.operators.similarity import near_dup_pairs_cosine_lsh
    from logvision_spark.sources.readers import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    plan = explain_str(near_dup_pairs_cosine_lsh(emb, threshold=0.4))
    assert "CartesianProduct" not in plan
    # the only aggregates allowed are none: bucketing, join, filter only
    assert "HashAggregate" not in plan


def test_trend_slope_builtin_is_partial_agg_no_python(feats, spark, sf_dir):
    """The regr_slope production path must be a declarative aggregate:
    map-side partial + final HashAggregate, no Arrow/Python nodes, and
    only the three needed columns off disk."""
    f = feats("a_user_trend_slope_builtin")
    assert f.hash_aggregates >= 2, "regr_slope lost map-side partials"
    assert not f.python_eval, "builtin slope path fell into Python"
    assert f.reads_only("user_id", "ts", "value")


def test_hll_mergeable_daily_two_stage_agg_no_python(feats, spark, sf_dir):
    """Daily-sketch + union must stay JVM aggregates (ObjectHashAggregate
    for sketch buffers is fine); the only join is the single-row exact
    pin, and only (ts, user_id) are scanned."""
    from logvision_spark.catalog import CATALOG
    from logvision_spark.plans.checks import explain_str

    f = feats("sketch_hll_mergeable_daily")
    assert not f.python_eval
    assert f.reads_only("ts", "user_id")
    plan = explain_str(CATALOG["sketch_hll_mergeable_daily"].builder(spark, sf_dir))
    assert "Aggregate" in plan


def test_q18_aggregates_before_join(spark, sf_dir):
    """Q18 must plan aggregate-then-join: the quantity sum + HAVING run
    on the narrow lineitem fact BEFORE orders is joined (measured 1.8×
    at sf0.1; the gap grows with fact width). In the optimized logical
    plan the Join is therefore the OUTER node (prints first) with the
    Aggregate in its subtree — join-then-aggregate would print
    Aggregate above Join."""
    from logvision_spark.catalog import CATALOG

    plan = (
        CATALOG["q18_large_orders"]
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Join" in plan and "Aggregate" in plan
    assert plan.index("Join") < plan.index("Aggregate"), (
        "q18 regressed to join-then-aggregate"
    )


def test_conversion_funnel_stages_computed_once(spark, sf_dir):
    """Each funnel stage must be computed exactly once: the executed
    plan scans events once per event type (3 total, one per stage's
    filter). The pre-r7 form counted each stage DataFrame separately,
    recomputing its predecessors — 6 scans."""
    from logvision_spark.plans.checks import explain_str

    plan = explain_str(CATALOG["a_conversion_funnel"].builder(spark, sf_dir))
    assert plan.count("events.parquet") <= 3, plan[:1500]


def test_asof_bucketed_spine_not_recomputed(spark, sf_dir):
    """The bucketed as-of's carry stage must reuse ONE spine subtree:
    at most 4 scans of events (left main + left-bucket distinct +
    right aggregate + right union rows) in EVERY direction. The pre-r7
    nearest called carry_for per direction, recomputing the whole
    spine — 8 scans; the union-spine's pruned rb branch added a fifth
    to backward."""
    from logvision_spark.plans.checks import explain_str

    for entry in ("j6_asof_bucketed", "j6_asof_bucketed_nearest"):
        plan = explain_str(CATALOG[entry].builder(spark, sf_dir))
        assert plan.count("events.parquet") <= 4, (entry, plan[:1500])
