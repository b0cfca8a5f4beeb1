"""Unit tests for the operator library on constructed inputs —
edge cases the fixture-driven oracle queries can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from etl_everywhere_hub_spark.operators.asof import asof_join, range_join
from etl_everywhere_hub_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup,
)
from etl_everywhere_hub_spark.operators.similarity import cosine_topk, lsh_ann_topk
from etl_everywhere_hub_spark.operators.windows import latest_per_key, ttl_filter


def test_latest_per_key_tiebreak(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, ts=10, id=1, v="a"),
            Row(k=1, ts=10, id=2, v="b"),  # same ts — higher id wins
            Row(k=1, ts=5, id=3, v="c"),
            Row(k=2, ts=1, id=4, v="d"),
        ]
    )
    out = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], "ts", "id").collect()}
    assert out == {1: "b", 2: "d"}


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [Row(k=1, t=100, lid=1), Row(k=1, t=50, lid=2), Row(k=1, t=5, lid=3)]
    ).selectExpr("k", "timestamp_micros(t*1000000) as t", "lid")
    right = spark.createDataFrame(
        [Row(k=1, t=10, rid=10), Row(k=1, t=60, rid=11), Row(k=1, t=100, rid=12)]
    ).selectExpr("k", "timestamp_micros(t*1000000) as t", "rid")
    out = asof_join(left, right, on="k", left_time="t", right_time="t", right_payload=["rid"])
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    # t=100 sees rid=12 (equal ts visible), t=50 sees rid=10, t=5 sees none
    assert got == {1: 12, 2: 10, 3: None}


def test_range_join_window_edges(spark):
    left = spark.createDataFrame([Row(k=1, t=1000, lid=1)]).selectExpr(
        "k", "timestamp_millis(t) as t", "lid"
    )
    right = spark.createDataFrame(
        [Row(k=1, t=1000, rid=1), Row(k=1, t=500, rid=2), Row(k=1, t=399, rid=3), Row(k=1, t=1001, rid=4)]
    ).selectExpr("k", "timestamp_millis(t) as rt", "rid")
    out = range_join(left, right, on="k", left_time="t", right_time="rt", window_ms=600)
    rids = sorted(r["rid"] for r in out.collect())
    # rid=1 (dt=0) and rid=2 (dt=500) in window; rid=3 (dt=601) and rid=4 (dt<0) out
    assert rids == [1, 2]


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [Row(doc_id=5, text="x"), Row(doc_id=2, text="x"), Row(doc_id=9, text="y")]
    )
    out = {r["text"]: (r["doc_id"], r["n_copies"]) for r in exact_dedup(df).collect()}
    assert out == {"x": (2, 2), "y": (9, 1)}


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words appear in this sentence about spark engines"
    df = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text=near), Row(doc_id=3, text=far)]
    )
    pairs = {(r["a"], r["b"]) for r in minhash_near_dup(df, threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_ttl_filter_null_time_evicted(spark):
    df = spark.createDataFrame(
        [Row(id=1, ts=None), Row(id=2, ts="2024-01-01 00:00:00"), Row(id=3, ts="2020-01-01 00:00:00")]
    ).selectExpr("id", "cast(ts as timestamp) as ts")
    now_ms = 1704067200000 + 3600_000  # 2024-01-01T01:00Z
    out = sorted(r["id"] for r in ttl_filter(df, "ts", now_ms, 2 * 3600_000).collect())
    # null → epoch 0 → evicted (reference task.ts:252); 2020 stale → evicted
    assert out == [2]


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = cosine_topk(emb, q, k=4, exact=False).toPandas()
    assert set(out["query_id"]) == {0, 1, 2}
    assert (out["query_id"] != out["neighbor_id"]).all()
    for qid, grp in out.groupby("query_id"):
        sims = grp.sort_values("rnk")["cosine_sim"].tolist()
        assert sims == sorted(sims, reverse=True)
        assert len(grp) == 4


def test_lsh_ann_recall_against_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=3, exact=False).toPandas()
    approx = lsh_ann_topk(emb, q, k=3, n_planes=4, n_tables=16).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # Top-3 neighbors on this data sit near cosine 0.29 → per-bit
    # collision ~0.59; 4 bits × 16 tables gives ~0.9 expected recall
    # (measured 0.87-1.0 across calibration settings).
    assert recall >= 0.7, f"LSH ANN recall too low: {recall}"


def test_builtin_stats_close_to_exact_formula(spark, sf_dir):
    """stddev_samp/var_samp builtins vs the exact-moment formulation used
    in the oracle contract (q16) — equal to float tolerance."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.stddev_samp("l_quantity").alias("sd"), F.var_samp("l_quantity").alias("vr")
    ).collect()[0]
    import duckdb

    ref = duckdb.sql(
        f"SELECT stddev_samp(l_quantity), var_samp(l_quantity) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()
    assert row["sd"] == pytest.approx(ref[0], rel=1e-9)
    assert row["vr"] == pytest.approx(ref[1], rel=1e-9)


def test_salted_aggregate_matches_plain(spark, sf_dir):
    """Two-phase salted aggregation must equal the plain groupBy (the
    salt only spreads the shuffle, never the semantics)."""
    from etl_everywhere_hub_spark.operators.skew import salted_aggregate

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("l_quantity") * 10000 + 0.5)).alias("s"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in salted_aggregate(
            li.select("l_returnflag", "l_quantity"),
            ["l_returnflag"],
            partial_aggs={
                "n": F.count(F.lit(1)),
                "s": F.sum(F.floor(F.col("l_quantity") * 10000 + 0.5)),
            },
            merge_aggs={"n": F.sum("n"), "s": F.sum("s")},
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_hash_split_stable_under_corpus_change(spark, sf_dir):
    """The property that justifies hash_split over df.sample: a row's
    split assignment is a pure function of its key — unchanged when
    the corpus is subset, grown, or repartitioned."""
    from etl_everywhere_hub_spark.operators.sampling import (
        deterministic_sample,
        hash_split,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("k")
    )
    full = {r["k"]: r["split"] for r in hash_split(d, "k").collect()}
    half = d.filter(F.col("k").cast("bigint") % 2 == 0)
    for r in hash_split(half.repartition(7), "k").collect():
        assert full[r["k"]] == r["split"]
    # weights respected within sampling tolerance at n=500
    from collections import Counter

    c = Counter(full.values())
    assert 0.6 < c["train"] / len(full) < 0.95 and c["val"] > 0 and c["test"] > 0
    # deterministic_sample: same rows every run, about the asked fraction
    s1 = {r["k"] for r in deterministic_sample(d, "k", 0.2).collect()}
    s2 = {r["k"] for r in deterministic_sample(d, "k", 0.2).collect()}
    assert s1 == s2 and 0.1 < len(s1) / len(full) < 0.3


def test_connected_components_known_graph(spark):
    """Hand-built graph: chain 1-2-3-4, triangle 10-11-12, edge 20-21.
    Min-label propagation must collapse each to its smallest id."""
    from etl_everywhere_hub_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "src bigint, dst bigint",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_global_prefix_sum_matches_naive_window(spark):
    """Distributed two-phase prefix sum == the naive global window, on
    an input built to stress the risky parts: duplicate order keys
    (ties must stay bucket-contiguous), skew (one key dominates), and
    any bucket count (boundaries must affect load balance only)."""
    from pyspark.sql import Window

    from etl_everywhere_hub_spark.operators.sampling import global_prefix_sum

    rows = [Row(id=i, q=(i * 7) % 5, v=i % 13 + 1) for i in range(400)]
    rows += [Row(id=1000 + i, q=2, v=3) for i in range(200)]  # heavy tie block
    df = spark.createDataFrame(rows)

    naive_w = (
        Window.orderBy(F.col("q").desc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expected = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(naive_w)).collect()
    }
    for n_buckets in (1, 7, 64):
        got = {
            r["id"]: r["cum"]
            for r in global_prefix_sum(
                df, "v", "q", "id", out="cum", n_buckets=n_buckets
            ).collect()
        }
        assert got == expected, f"n_buckets={n_buckets}"


def test_pq_adc_ranking_tracks_exact_ranking(spark, sf_dir):
    """q170's product quantization must be a usable ANN primitive, not
    just an encodable one: over the full corpus, the top-10 by
    asymmetric (code-based) distance must substantially overlap the
    top-10 by exact distance. The query vector (vec 0) must have exact
    distance 0 and — since its codes are by definition the per-subspace
    argmin centroids for the query itself — its ADC distance equals
    sum_s min_c d(q_s, c), a lower bound on every other vector's ADC
    distance, so vec 0 must be the ADC argmin. (Under the r3 lowest-id
    seeding its ADC self-distance was exactly 0; Lloyd training moves
    the centroids, so the self-distance is now the nonzero quantization
    error — the argmin property is the one that survives training.)"""
    from etl_everywhere_hub_spark.queries import REGISTRY

    df = REGISTRY["q170_product_quantization"].spark(spark, sf_dir).collect()
    rows = {r["vec_id"]: (r["approx_d2_micro"], r["exact_d2_micro"]) for r in df}
    assert rows[0][1] == 0  # the query vector: exact self-distance
    assert rows[0][0] == min(a for a, _ in rows.values())  # ADC argmin
    by_adc = sorted(rows, key=lambda v: (rows[v][0], v))[:10]
    by_exact = sorted(rows, key=lambda v: (rows[v][1], v))[:10]
    overlap = len(set(by_adc) & set(by_exact))
    assert overlap >= 5, (by_adc, by_exact)


def test_star_contraction_converges_on_path_graph_in_log_rounds(spark):
    """VERDICT r3 item #3: label propagation needs O(diameter) rounds —
    a 1000-node PATH graph needs 1000 of them. Star contraction must
    solve the same path within max_iter=15 (~log2 rounds), proving the
    O(log n) bound that survives chain-shaped 100 TB graphs."""
    from etl_everywhere_hub_spark.operators.graph import connected_components

    n = 1000
    edges = spark.range(n - 1).selectExpr("id as src", "id + 1 as dst")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, max_iter=15).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {0}


def test_star_contraction_matches_labelprop_on_random_graphs(spark):
    """Differential: star contraction and min-label propagation must
    produce identical (id, component) labelings on random graphs of
    mixed shape (forests + cycles + isolated self-loop)."""
    import random

    from etl_everywhere_hub_spark.operators.graph import (
        connected_components,
        connected_components_labelprop,
    )

    rng = random.Random(42)
    for trial in range(3):
        n = 120
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(30, 90))
        ]
        pairs.append((77, 77))  # self-loop: node must label itself
        edges = spark.createDataFrame(pairs, "src long, dst long")
        a = {
            r["id"]: r["component"]
            for r in connected_components(edges, max_iter=20).collect()
        }
        b = {
            r["id"]: r["component"]
            for r in connected_components_labelprop(edges, max_iter=60).collect()
        }
        assert a == b, f"trial {trial}: {sorted(set(a.items()) ^ set(b.items()))[:6]}"


def test_exact_substring_spans_reconstruct_full_runs(spark):
    """Losslessness of the suffix-array-free reformulation: a run of
    L >= W tokens duplicated across docs must merge back to exactly
    [start, start + L - 1] in each doc — the W-window marks overlap
    into the full run, no more, no less. Also: a within-doc repeat
    counts (min_count is corpus-wide occurrences), and untouched docs
    produce no spans."""
    from etl_everywhere_hub_spark.operators.dedup import (
        exact_substring_spans,
        strip_duplicate_spans,
    )

    run = " ".join(f"r{i}" for i in range(10))  # L=10 shared run
    docs = [
        (0, f"a0 a1 a2 {run} z0 z1"),            # run at tokens 3..12
        (1, f"{run} b0 b1 b2 b3 b4"),            # run at tokens 0..9
        (2, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"),    # unique, no spans
        (3, f"d0 {run} d1 {run}"),               # within-doc repeat too
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in exact_substring_spans(df, window=8).collect()
    }
    assert spans == {(0, 3, 12), (1, 0, 9), (3, 1, 10), (3, 12, 21)}
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"])
        for r in strip_duplicate_spans(
            df, exact_substring_spans(df, window=8)
        ).collect()
    }
    assert out[0] == (15, 1, 10)
    assert out[2] == (10, 0, 0)
    assert out[3] == (22, 2, 20)


def test_misra_gries_trimming_path_still_exact(spark):
    """The MG trim must actually engage (vocab >> counters) and the
    two-pass answer must still be EXACTLY the naive groupBy-HAVING:
    one heavy value at 1/3 share buried in 200 distinct fillers,
    k_counters=8 (so partitions trim constantly), threshold den=4
    (strict >1/4 keeps 1/3; den=3 would exclude it — the HAVING is
    strict). Coverage guarantee: 1/3 > 1/(8+1), so the heavy value
    must survive phase 1 in some partition; phase 2 exactness does
    the rest."""
    from etl_everywhere_hub_spark.operators.sketches import heavy_hitters_exact

    rows = [("heavy",)] * 100 + [(f"f{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, ["tok"]).repartition(5)
    got = {
        (r["tok"], r["cnt"], r["share_ppm"])
        for r in heavy_hitters_exact(
            df, "tok", k_counters=8, threshold_den=4
        ).collect()
    }
    assert got == {("heavy", 100, 100 * 1_000_000 // 300)}


def test_grid_dbscan_known_answer(spark):
    """Constructed two-blob + border + noise case with a hand-checked
    DBSCAN answer (eps=1.0, minPts=3, closed neighborhoods): blob A
    {1,2,3,4} all core (cluster 1), blob B {5,6,7} all core (cluster
    5), point 8 is density-reachable from A's edge but not core
    (border, cluster 1), point 9 is noise (cluster -1)."""
    from etl_everywhere_hub_spark.operators.clustering import grid_dbscan

    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 0.0, 0.5), (4, 0.5, 0.5),
            (5, 10.0, 10.0), (6, 10.5, 10.0), (7, 10.0, 10.5),
            (8, 1.4, 0.0),
            (9, 20.0, 20.0),
        ],
        ["id", "lon", "lat"],
    )
    got = {
        r["id"]: (r["role"], r["cluster"])
        for r in grid_dbscan(pts, eps=1.0, min_pts=3).collect()
    }
    assert got == {
        1: ("core", 1), 2: ("core", 1), 3: ("core", 1), 4: ("core", 1),
        5: ("core", 5), 6: ("core", 5), 7: ("core", 5),
        8: ("border", 1),
        9: ("noise", -1),
    }


def test_merkle_bucket_diff_finds_exactly_dirty_buckets(spark, sf_dir):
    """q189's checksum layer must flag exactly the buckets containing a
    modified (%613) or deleted (%977) key — no misses (a miss would be
    an xor collision), no false alarms (clean buckets hash equal)."""
    from etl_everywhere_hub_spark.queries import REGISTRY

    got = {r["bucket"] for r in REGISTRY["q189_merkle_bucket_diff"].spark(
        spark, sf_dir).collect()}
    keys = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter((F.col("o_orderkey") % 613 == 0) | (F.col("o_orderkey") % 977 == 0))
        .filter(F.col("o_orderkey") != 0)  # key 0: A drops it, B updates it
        .collect()
    ]
    assert got == {k % 64 for k in keys} | {0}  # bucket 0 holds key 0


def test_bfs_hops_known_graph(spark):
    """Path 0-1-2-3-4-5 plus isolated seed 10: hops are exact shortest
    distances, the horizon cuts at max_hops, unreached vertices are
    absent, and an isolated seed still reports hop 0."""
    from etl_everywhere_hub_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,), (10,)], ["id"])
    got = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 10: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_min_over_multiple_seeds(spark):
    """A vertex reachable from two seeds takes the MINIMUM hop count
    (frontier expansion can't relabel an already-visited vertex)."""
    from etl_everywhere_hub_spark.operators.graph import bfs_hops

    # 0-1-2-3-4 with seeds at both ends: middle vertex 2 is 2 hops
    # from either seed; vertex 3 is 1 from seed 4, not 3 from seed 0.
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)], ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (4,)], ["id"])
    got = {r["id"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=4).collect()}
    assert got == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_kcore_peels_chain_keeps_clique(spark):
    """4-clique {1,2,3,4} with a pendant chain 4-5-6: the 3-core is
    exactly the clique (the chain unravels over two peel rounds), and
    every survivor reports its degree inside the core."""
    from etl_everywhere_hub_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(clique + [(4, 5), (5, 6)], ["src", "dst"])
    got = {r["id"]: r["core_deg"] for r in k_core(edges, k=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k above the max degree peels everything
    assert k_core(edges, k=5).count() == 0


def test_kcore_fixed_rounds_equal_fixpoint(spark):
    """The q192 oracle contract: running MORE rounds than convergence
    needs is a no-op — max_iter=2 (converged) and max_iter=10 agree on
    a graph whose peel depth is 2."""
    from etl_everywhere_hub_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(clique + [(4, 5), (5, 6)], ["src", "dst"])
    a = sorted(map(tuple, k_core(edges, k=3, max_iter=2).collect()))
    b = sorted(map(tuple, k_core(edges, k=3, max_iter=10).collect()))
    assert a == b


def test_global_prefix_min_matches_naive_window(spark):
    """Two-phase distributed prefix-min == the naive single-partition
    exclusive-frame window, including null for the global first row
    and ties in the order key (tiebreak column pins a total order)."""
    import random

    from pyspark.sql import Window

    from etl_everywhere_hub_spark.operators.sampling import global_prefix_min

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 99) / 4.0, rng.randint(-50, 50)) for i in range(400)]
    # inject order-key ties
    rows += [(1000 + i, rows[i][1], rng.randint(-50, 50)) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "key", "val"])
    w = (
        Window.orderBy(F.col("key").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = {
        r["id"]: r["naive"]
        for r in df.withColumn("naive", F.min("val").over(w)).collect()
    }
    got = {
        r["id"]: r["prefix_min"]
        for r in global_prefix_min(
            df, "val", order_col="key", tiebreak_col="id", n_buckets=8
        ).collect()
    }
    assert got == want


def test_bellman_ford_prefers_cheap_long_path(spark):
    """Weighted relaxation must beat hop-greedy: direct edge 0-3 costs
    10, the three-hop detour 0-1-2-3 costs 3 — Bellman-Ford at 4 hops
    returns 3 for vertex 3 (BFS would stop at the 1-hop edge)."""
    from etl_everywhere_hub_spark.operators.graph import bellman_ford_hops

    edges = spark.createDataFrame(
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {r["id"]: r["dist"] for r in bellman_ford_hops(edges, seeds, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    # hop bound 1: only the direct (expensive) edge is reachable
    got1 = {r["id"]: r["dist"] for r in bellman_ford_hops(edges, seeds, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1, 3: 10}


def test_ancestors_doubling_chain_depth_exceeds_linear_rounds(spark):
    """A 64-deep chain closes within 6 doubling rounds (log2(64)) —
    the closure contains every (node, ancestor-or-self) pair."""
    from etl_everywhere_hub_spark.operators.graph import ancestors_doubling

    rows = [(i, i - 1 if i > 0 else None) for i in range(64)]
    df = spark.createDataFrame(rows, ["id", "parent"])
    got = {(r["id"], r["anc"]) for r in ancestors_doubling(df, max_rounds=6).collect()}
    want = {(i, a) for i in range(64) for a in range(i + 1)}
    assert got == want


def test_ancestors_doubling_rejects_multi_parent_dag(spark):
    """The forest precondition fails LOUDLY: node 3 with two parents
    (a DAG) must raise, not silently collapse parallel paths
    (SCALE.md §4.7)."""
    import pytest

    from etl_everywhere_hub_spark.operators.graph import ancestors_doubling

    rows = [(1, None), (2, None), (3, 1), (3, 2)]
    df = spark.createDataFrame(rows, "id long, parent long")
    with pytest.raises(ValueError, match="multiple parents"):
        ancestors_doubling(df)


def test_temporal_reachability_respects_time_order(spark):
    """The defining case: 0 contacts 1 at t=5, 1 contacted 2 at t=3 —
    a plain BFS reaches 2, but time-respecting reachability must NOT
    (the 1->2 contact happened before 1 was reached); a later 1->3
    contact at t=7 IS reached with arrival 7."""
    from etl_everywhere_hub_spark.operators.graph import temporal_reachability

    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 3), (1, 3, 7)], ["src", "dst", "t"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    got = {
        r["id"]: r["arrival"]
        for r in temporal_reachability(edges, seeds, max_hops=4).collect()
    }
    assert got == {0: -1, 1: 5, 3: 7}


def test_global_rank_matches_naive_row_number(spark):
    """global_rank == the single-partition row_number window on seeded
    data with order-key ties (descending order, ascending tiebreak)."""
    import random

    from pyspark.sql import Window

    from etl_everywhere_hub_spark.operators.sampling import global_rank

    rng = random.Random(13)
    rows = [(i, rng.randrange(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "v"])
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    want = {r["id"]: r["rn"] for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, "v", "id", descending=True, n_buckets=8).collect()
    }
    assert got == want


def test_exact_ntile_matches_spark_ntile(spark):
    """The shared integer ntile helper (q226/q236) must replicate
    Spark's own ntile() for every (n, tiles) shape including n < tiles
    and n % tiles != 0 — same first-tiles-get-ceil sizing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.operators.sampling import exact_ntile

    for n in [1, 3, 4, 7, 10, 23]:
        for tiles in [2, 4, 10]:
            df = (
                spark.range(n)
                .withColumn("rk", F.col("id") + 1)
                .withColumn("n", F.lit(n).cast("long"))
            )
            got = df.withColumn("t", exact_ntile("rk", "n", tiles))
            want = df.withColumn(
                "t", F.ntile(tiles).over(Window.orderBy("rk"))
            )
            g = {r["rk"]: r["t"] for r in got.collect()}
            w = {r["rk"]: r["t"] for r in want.collect()}
            assert g == w, (n, tiles, g, w)


def test_hits_exact_known_graph(spark):
    """Directed 1→3, 2→3, 2→4: 2 is the stronger hub (points at both
    authorities), 3 the stronger authority (both hubs point at it).
    Scores hand-computed through both integer sum-normalized
    iterations — exact equality, not just ranking."""
    from etl_everywhere_hub_spark.operators.graph import hits_exact

    edges = spark.createDataFrame([(1, 3), (2, 3), (2, 4)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], ["id"])
    got = {
        r["id"]: (r["hub_ppm"], r["auth_ppm"])
        for r in hits_exact(nodes, edges, iters=2).collect()
    }
    # iter1: a(3)=2e12 div 3e6=666666, a(4)=333333; h(1)=400000, h(2)=600000
    # iter2: a(3)=625000, a(4)=375000; h(1)=384615, h(2)=615384
    assert got == {
        1: (384615, 0),
        2: (615384, 0),
        3: (0, 625000),
        4: (0, 375000),
    }


def test_simhash_band_blocking_equals_brute_force(spark, sf_dir):
    """Pigeonhole exactness of q262's 4x12-bit band blocking: every
    pair within Hamming distance 3 of the 48-bit SimHash shares at
    least one band, so the band-join pair set must equal the O(n^2)
    all-pairs form exactly (same pairs, same distances)."""
    from etl_everywhere_hub_spark.operators import dedup as dedup_ops
    from etl_everywhere_hub_spark.queries import REGISTRY

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocked = REGISTRY["q262_simhash_band_pairs"].spark(spark, sf_dir)
    sigs = dedup_ops.simhash(d, "text", "doc_id", bits=48)
    a = sigs.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= 3)
    )
    got = {tuple(r) for r in blocked.collect()}
    want = {tuple(r) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_kmv_sketch_merge_associativity(spark, sf_dir):
    """KMV sketches merge by keeping the k smallest of the union: the
    sketch of the whole must equal the merge of per-shard sketches —
    the property that makes q260 re-aggregable across partitions."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
    )
    from etl_everywhere_hub_spark.functions.hashing import md5_long

    hs = ev.select(
        F.shiftright(md5_long(F.col("user_id").cast("string")), 6).alias("h"),
        (F.col("user_id") % 4).alias("shard"),
    ).distinct()
    k = 16
    whole = [r.h for r in hs.orderBy("h").limit(k).collect()]
    shard_sketches = (
        hs.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("shard").orderBy("h")),
        )
        .filter(F.col("rk") <= k)
        .select("h")
    )
    merged = [r.h for r in shard_sketches.orderBy("h").limit(k).collect()]
    assert whole == merged


def test_bloom_semijoin_matches_plain_semijoin(spark, sf_dir):
    """q261's Bloom pre-filter is transparent: its verified output
    must equal the plain semi-join aggregate, and the Bloom pass-set
    must be a superset of the true key set (no false negatives)."""
    from etl_everywhere_hub_spark.queries import REGISTRY

    got = REGISTRY["q261_bloom_semijoin"].spark(spark, sf_dir)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    keys = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    want = (
        o.join(keys, o.o_custkey == keys.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_grouped_global_prefix_sum_matches_naive_window(spark):
    """The grouped two-phase scan must equal the naive
    Window.partitionBy(group) cumsum for every row, including ties in
    the order column, across bucket-count settings."""
    import random

    from etl_everywhere_hub_spark.operators.sampling import (
        grouped_global_prefix_sum,
        grouped_global_rank,
    )

    rnd = random.Random(7)
    rows = [
        Row(g=f"g{rnd.randrange(3)}", k=rnd.randrange(20), uid=i, v=rnd.randrange(5))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows)
    for nb in (1, 4, 32):
        got = grouped_global_prefix_sum(
            df, "v", group_col="g", order_col="k", tiebreak_col="uid",
            out="cum", n_buckets=nb, descending=True,
        ).select("uid", "cum")
        w = (
            Window.partitionBy("g")
            .orderBy(F.col("k").desc(), F.col("uid").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        want = df.withColumn("cum", F.sum("v").over(w)).select("uid", "cum")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        ), f"n_buckets={nb}"
    got_rk = grouped_global_rank(
        df, group_col="g", order_col="k", tiebreak_col="uid", out="rk",
        descending=False,
    ).select("uid", "rk")
    w2 = Window.partitionBy("g").orderBy(F.col("k").asc(), F.col("uid").asc())
    want_rk = df.withColumn("rk", F.row_number().over(w2).cast("long")).select(
        "uid", "rk"
    )
    assert sorted(map(tuple, got_rk.collect())) == sorted(
        map(tuple, want_rk.collect())
    )


def test_scc_pivot_peel_known_digraph(spark):
    """SCC on a hand-built digraph: two directed cycles (1→2→3→1 and
    10→11→10) joined by one-way bridges 3→10 and 11→20 (20 is a
    sink). Expected SCCs: {1,2,3} (label 1), {10,11} (label 10),
    {20} (label 20). Also pins the deterministic min-id labeling."""
    from etl_everywhere_hub_spark.operators.graph import scc_pivot_peel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10), (11, 20)],
        "src long, dst long",
    )
    got = {
        (r["id"], r["component"])
        for r in scc_pivot_peel(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20),
    }


def test_scc_pivot_peel_empty_and_peel_cap(spark):
    """Degenerate inputs (ADVICE r5): an empty edge set must return an
    empty (id, component) frame, not IndexError; and a graph with more
    SCCs than max_peels must still return EVERY vertex (leftovers
    labelled as singletons with a logged warning), never a silently
    incomplete partition."""
    from etl_everywhere_hub_spark.operators.graph import scc_pivot_peel

    empty = spark.createDataFrame([], "src long, dst long")
    out = scc_pivot_peel(empty)
    assert out.columns == ["id", "component"] and out.count() == 0

    # chain 0→1→…→5: six singleton SCCs, cap at 3 peels
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src long, dst long"
    )
    got = {
        (r["id"], r["component"])
        for r in scc_pivot_peel(chain, max_peels=3).collect()
    }
    # every vertex present exactly once; the 3 peeled ones carry the
    # min-id pivot label, leftovers label themselves
    assert {i for i, _ in got} == set(range(6))
    assert got == {(i, i) for i in range(6)}
