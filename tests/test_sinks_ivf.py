"""foreachBatch upsert sink + IVF ANN tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_everywhere_hub_spark.operators.similarity import cosine_topk, ivf_topk
from etl_everywhere_hub_spark.operators.windows import latest_per_key
from etl_everywhere_hub_spark.streaming import jobs, sinks


def test_upsert_snapshot_sink_matches_batch_latest(spark, sf_dir, tmp_path):
    """Stream events through the foreachBatch upsert sink; the snapshot
    table must equal the batch latest-per-key over the same data —
    the reference's EphemeralStore persistence (task.ts:145-149)."""
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    s = jobs.stream_events(spark, sf_dir)
    q = sinks.upsert_snapshot_sink(
        s, state, keys=["user_id"], order_col="ts", tiebreak="event_id", checkpoint_dir=ckpt
    )
    q.awaitTermination()

    snapshot = {r["user_id"]: r["event_id"] for r in spark.read.parquet(state).collect()}
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(e.dtypes).get("ts") == "bigint":
        e = e.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    expected = {
        r["user_id"]: r["event_id"]
        for r in latest_per_key(e, ["user_id"], "ts", "event_id").collect()
    }
    assert snapshot == expected


def test_upsert_sink_incremental_merge(spark, tmp_path):
    """Second batch must upsert over the first snapshot, not replace
    keys it doesn't carry."""
    state = str(tmp_path / "state2")
    b1 = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 11)], "k long, ts long, eid long"
    )
    b2 = spark.createDataFrame([(1, 200, 12)], "k long, ts long, eid long")
    sinks._merge_overwrite(b1, state, ["k"], "ts", "eid")
    sinks._merge_overwrite(b2, state, ["k"], "ts", "eid")
    snap = {r["k"]: (r["ts"], r["eid"]) for r in spark.read.parquet(state).collect()}
    assert snap == {1: (200, 12), 2: (100, 11)}  # k=1 updated, k=2 retained
    # stale replay (older ts) must NOT regress the snapshot
    sinks._merge_overwrite(b1, state, ["k"], "ts", "eid")
    snap2 = {r["k"]: (r["ts"], r["eid"]) for r in spark.read.parquet(state).collect()}
    assert snap2 == snap


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=3, exact=False).toPandas()
    approx = ivf_topk(emb, q, k=3, n_cells=8, n_probe=4).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_pairs = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # probing half the cells on near-uniform data: expect ≳0.5
    assert recall >= 0.4, f"IVF recall too low: {recall}"
    assert (approx["query_id"] != approx["neighbor_id"]).all()


def test_lloyd_training_improves_or_matches_seed_recall(spark, sf_dir):
    """VERDICT r3 item #4: Lloyd-trained centroids must not lose recall
    vs the lowest-id seeding they replace (same cells/probes), and must
    be deterministic — bit-identical across two training runs."""
    import numpy as np

    from etl_everywhere_hub_spark.operators.similarity import train_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # queries must NOT be the seed vectors (vec_id < n_cells ARE the
    # lowest-id seeds, which hands the seeded index a perfect-recall
    # bias: a query that IS a centroid always probes its own cell)
    q = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 120))
    exact = cosine_topk(emb, q, k=3, exact=False).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))

    def recall(df):
        pairs = set(zip(df["query_id"], df["neighbor_id"]))
        return len(exact_pairs & pairs) / len(exact_pairs)

    seeded = recall(ivf_topk(emb, q, k=3, n_cells=16, n_probe=2, train_iters=0).toPandas())
    trained = recall(ivf_topk(emb, q, k=3, n_cells=16, n_probe=2, train_iters=2).toPandas())
    assert trained >= seeded, f"Lloyd lost recall: {trained} < {seeded}"

    c1 = train_ivf_centroids(emb, n_cells=8, train_iters=2)
    c2 = train_ivf_centroids(emb, n_cells=8, train_iters=2)
    assert np.array_equal(c1, c2)  # bit-identical, not allclose
