"""Physical-plan property tests (SURVEY.md §4): the scale posture,
machine-checked. These are the properties that decide whether a plan
survives 100 TB — not timings, which don't transfer from local mode.
"""

from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.plans import explain as X
from etl_everywhere_hub_spark.queries import REGISTRY


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["q02_filter_predicates"].spark(spark, sf_dir)
    assert X.has_pushed_filters(df), X.formatted_plan(df)


def test_column_pruning_projection_only(spark, sf_dir):
    """q01 touches 7 of lineitem's 11 columns; the scan must not read
    the other 4 (l_partkey, l_suppkey, l_linenumber, l_orderkey)."""
    df = REGISTRY["q01_pricing_summary"].spark(spark, sf_dir)
    cols = set(X.read_schema_columns(df))
    assert cols, X.formatted_plan(df)
    assert "l_partkey" not in cols and "l_suppkey" not in cols
    assert {"l_quantity", "l_extendedprice", "l_discount"} <= cols


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = REGISTRY["q17_revenue_by_nation"].spark(spark, sf_dir)
    assert X.uses_broadcast_join(df), X.simple_plan(df)


def test_no_cartesian_in_joins(spark, sf_dir):
    """Every join-bearing query must be equi-shaped (no cartesian /
    broadcast-nested-loop) — except the deliberate bounded cross join
    in cosine top-k, where the broadcast side is the tiny query set."""
    for name in [
        "q17_revenue_by_nation",
        "q18_order_count_distribution",
        "q19_semi_join",
        "q20_anti_join",
        "q21_theta_self_join",
        "q22_asof_join",
        "q23_range_join",
        "q40_ngram_jaccard",
        "q41_minhash_lsh",
        "q44_cosine_near_dup",
        "q54_broadcast_lookup",
        "q67_array_map_date_extras",
    ]:
        df = REGISTRY[name].spark(spark, sf_dir)
        assert not X.has_cartesian(df), f"{name} degenerated:\n{X.physical_plan(df)[:2000]}"


def test_aggregation_has_mapside_partial(spark, sf_dir):
    df = REGISTRY["q01_pricing_summary"].spark(spark, sf_dir)
    assert X.has_partial_aggregation(df), X.physical_plan(df)[:2000]


def test_hot_paths_are_codegen(spark, sf_dir):
    """Relational queries must run inside whole-stage codegen spans."""
    for name in ["q01_pricing_summary", "q06_math_funcs", "q17_revenue_by_nation"]:
        df = REGISTRY[name].spark(spark, sf_dir)
        assert X.codegen_stage_count(df) >= 1, name


def test_latest_per_key_single_shuffle(spark, sf_dir):
    """The device-cache batch formulation must be one hash shuffle on
    the key (window) — no extra exchanges."""
    df = REGISTRY["q28_latest_per_key"].spark(spark, sf_dir)
    p = X.physical_plan(df)
    assert p.count("Exchange") <= 1, p[:2000]
