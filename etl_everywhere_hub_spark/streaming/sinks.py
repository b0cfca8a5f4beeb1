"""Streaming sinks (SURVEY §2.B sources/sinks: foreachBatch upsert).

The reference persists its device cache across invocations as a keyed
blob (load at /root/reference/task.ts:145,169; store at
task.ts:149,242,262). The Spark-native equivalent is a snapshot state
table maintained by foreachBatch: each micro-batch merges its newest
row per key into the table (last-write-wins upsert, task.ts:148).

Plain parquet directories (no Delta in this container): the merge is
read-modify-overwrite of a compact snapshot whose size is O(keys) —
the reference's EphemeralStore has the same bound via TTL eviction.
On a lakehouse deployment, swap `_merge_overwrite` for a Delta MERGE;
the operator contract is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from etl_everywhere_hub_spark.operators.windows import latest_per_key


def _merge_overwrite(
    batch_df: DataFrame, state_path: str, keys: list[str], order_col: str, tiebreak: str
) -> None:
    spark = batch_df.sparkSession
    newest = latest_per_key(batch_df, keys, order_col, tiebreak)
    if os.path.exists(state_path) and any(
        f.endswith(".parquet") for f in os.listdir(state_path)
    ):
        current = spark.read.parquet(state_path)
        merged = latest_per_key(
            current.unionByName(newest), keys, order_col, tiebreak
        )
    else:
        merged = newest
    # checkpointed micro-batches make the overwrite idempotent on replay
    merged.write.mode("overwrite").format("parquet").save(state_path + "_next")
    spark.read.parquet(state_path + "_next").write.mode("overwrite").parquet(state_path)


def upsert_snapshot_sink(
    stream: DataFrame,
    state_path: str,
    keys: list[str],
    order_col: str,
    tiebreak: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Keyed last-write-wins snapshot table fed by a stream."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch_df, _bid: _merge_overwrite(
                batch_df, state_path, keys, order_col, tiebreak
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def http_submit_sink(
    features: DataFrame,
    url: str,
    feature_col: str = "feature_json",
    chunk: int = 100,
) -> None:
    """Submit GeoJSON FeatureCollections over HTTP POST — the live
    CloudTAK submit leg (reference: `this.submit(fc)` after both the
    webhook and poll transforms, task.ts:151-154 and task.ts:235).

    Executor-side, stdlib-only: each PARTITION groups its rows into
    FeatureCollection bodies of ≤ ``chunk`` features and POSTs them —
    no driver collect, so submission bandwidth scales with executor
    count exactly like the reference's horizontally-scaled lambda.
    Delivery is at-least-once per micro-batch (a failed task retries
    whole partitions; CloudTAK upserts by feature id, task.ts:145-149,
    so replays converge — same contract as the snapshot sink).

    ``feature_col`` holds one serialized GeoJSON Feature per row
    (build with F.to_json(struct(...)); pipeline/cot.py owns the
    CoT-flavored construction). For streams, wrap in foreachBatch:

        q = fc.writeStream.foreachBatch(
            lambda df, _id: http_submit_sink(df, url)).start()
    """

    def send_partition(rows) -> None:
        import json as _json
        import urllib.request

        feats: list = []

        def flush() -> None:
            if not feats:
                return
            body = _json.dumps(
                {"type": "FeatureCollection", "features": feats}
            ).encode()
            req = urllib.request.Request(
                url,
                data=body,
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=30) as resp:
                resp.read()
            feats.clear()

        for row in rows:
            feats.append(_json.loads(row[feature_col]))
            if len(feats) >= chunk:
                flush()
        flush()

    features.select(feature_col).foreachPartition(send_partition)
