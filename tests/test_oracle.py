"""Differential oracle test: every registry query vs its DuckDB twin.

This is the same comparison the correctness driver performs at sf0.01,
run at sf0.001 as the repo's always-on gate (SURVEY.md §5 item 1).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from etl_everywhere_hub_spark.queries import REGISTRY


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, np.floating):
        return canon_cell(float(v))
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_df(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    q = REGISTRY[name]
    try:
        sdf = q.spark(spark, sf_dir).toPandas()
    finally:
        # drop per-query persist()s so the full-registry sweep doesn't
        # accumulate executor memory across 150+ queries
        spark.catalog.clearCache()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = oracle.sql(q.oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), "column sets differ"
    assert len(sdf) == len(odf), f"rowcount spark={len(sdf)} oracle={len(odf)}"
    s_rows, o_rows = canon_df(sdf), canon_df(odf)
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, f"row {i}: spark={a} oracle={b}"


def test_registry_contract():
    """Driver-contract invariants: unique q-number prefixes, every
    query declares oracle SQL (no silent rows-only downgrades), and
    headline queries exist for the bench."""
    prefixes = [n.split("_")[0] for n in REGISTRY]
    assert len(prefixes) == len(set(prefixes)), "duplicate q-number"
    missing = [n for n, q in REGISTRY.items() if q.oracle is None]
    assert missing == [], f"queries without oracle SQL: {missing}"
    assert sum(q.headline for q in REGISTRY.values()) >= 12
    for name, q in REGISTRY.items():
        assert name == q.name


# The cross-round bench comparison (BENCH_r{N}.json / BENCH_DETAIL.json)
# is only meaningful if the denominator is stable: this is the round-5
# set plus the two DELIBERATE round-7 additions (q139 iterative graph,
# q331 mapInPandas codec — VERDICT r6 #7; CHANGELOG note in
# BASELINE.md). Further additions/removals must edit this list WITH a
# CHANGELOG note in BASELINE.md (VERDICT r5 #8 — gates the bench
# headline set against silent shrinkage). prev_spark_s chaining stays
# intact for the original 17; the two new names start with prev=null.
HEADLINE_SET_R7 = {
    "q139_pagerank_iterations",
    "q331_jpeg_decode_real_pixels",
    "q01_pricing_summary",
    "q105_local_supplier_volume",
    "q116_bigram_lm_score",
    "q127_spatial_proximity_join",
    "q136_hashed_ngram_classifier",
    "q156_trajectory_radius_join",
    "q17_revenue_by_nation",
    "q18_order_count_distribution",
    "q22_asof_join",
    "q28_latest_per_key",
    "q29_sessionization",
    "q34_device_cache",
    "q35_exact_dedup",
    "q37_text_quality",
    "q39_tf_idf",
    "q41_minhash_lsh",
    "q43_cosine_topk",
}


def test_bench_headline_set_is_pinned():
    """The headline=True registry entries must match the pinned r5
    bench set exactly, and every pinned name must appear in the
    committed BENCH_DETAIL.json sidecar (when one exists) — so the
    round-over-round ratio never quietly changes denominator."""
    import json
    import os

    from etl_everywhere_hub_spark.queries import headline_queries

    assert set(headline_queries()) == HEADLINE_SET_R7

    sidecar = os.path.join(os.path.dirname(__file__), "..", "BENCH_DETAIL.json")
    if os.path.exists(sidecar):
        detail = json.load(open(sidecar)).get("queries_detail", {})
        missing = HEADLINE_SET_R7 - set(detail)
        assert missing == set(), f"headline queries absent from bench: {missing}"


def test_no_query_is_vacuous_at_driver_scale(oracle):
    """Every oracle query must return rows at sf0.01 (the driver's
    gate scale) — a 0-row result matches any 0-row bug trivially, so
    an empty query proves nothing. DuckDB-only: cheap. (q20's original
    form passed vacuously for most of round 1 before this gate.)"""
    import duckdb

    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    empty = []
    for name, q in sorted(REGISTRY.items()):
        n = con.execute(f"SELECT count(*) FROM ({q.oracle})").fetchone()[0]
        if n == 0:
            empty.append(name)
    assert empty == [], f"vacuous at sf0.01: {empty}"
