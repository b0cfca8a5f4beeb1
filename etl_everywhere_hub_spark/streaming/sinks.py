"""Streaming sinks (SURVEY §2.B sources/sinks: foreachBatch upsert).

The reference persists its device cache across invocations as a keyed
blob (load at /root/reference/task.ts:145,169; store at
task.ts:149,242,262). The Spark-native equivalent is a snapshot state
table maintained by foreachBatch: each micro-batch merges its newest
row per key into the table (last-write-wins upsert, task.ts:148).

Plain parquet directories (no Delta in this container): the merge is
read-modify-overwrite of a compact snapshot whose size is O(keys) —
the reference's EphemeralStore has the same bound via TTL eviction.

Round 8 adds ``merge_cdc_sink``: full Delta-MERGE (I/U/D) semantics
over an atomically-committed versioned snapshot (temp dir → rename →
manifest os.replace — the Kafka-populate pattern), kill-and-resume
and per-crash-window tested in tests/test_crash_recovery.py. On a
lakehouse deployment the swap is the table format plus one
``MERGE INTO`` statement inside ``_merge_cdc_batch``; every other
line (LWW keying, op routing, checkpoint idempotence) is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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


def _read_manifest(state_path: str) -> str | None:
    mpath = os.path.join(state_path, "_MANIFEST")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        v = fh.read().strip()
    return v or None


def read_merge_snapshot(spark, state_path: str) -> DataFrame | None:
    """Current committed snapshot of a merge_cdc_sink table, or None
    before the first commit. Readers NEVER list the directory — the
    manifest is the single source of truth, so a concurrent commit
    (write-temp → rename → manifest replace) can never expose a
    partial snapshot."""
    v = _read_manifest(state_path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_path, v))


def _commit_snapshot(merged: DataFrame, state_path: str, batch_id: int) -> None:
    """Atomic versioned commit (the Kafka-populate pattern): write to
    a pid-suffixed temp dir, rename into the versioned slot, then
    atomically repoint the manifest (os.replace). Every crash window
    is safe: before the rename nothing is visible; between rename and
    manifest the old version still serves reads and a checkpointed
    REPLAY of the same batch_id rebuilds the slot (stale slot removed
    via rename-to-quarantine first, so a reader following the old
    manifest never sees a vanishing directory it was pointed at —
    the manifest never points at the slot being rebuilt)."""
    import shutil

    os.makedirs(state_path, exist_ok=True)
    vname = f"v{batch_id:012d}"
    vdir = os.path.join(state_path, vname)
    tmp = f"{vdir}.tmp-{os.getpid()}"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(vdir):  # replay after a crash past the rename
        quarantine = f"{vdir}.stale-{os.getpid()}"
        os.rename(vdir, quarantine)
        shutil.rmtree(quarantine, ignore_errors=True)
    os.rename(tmp, vdir)
    mtmp = os.path.join(state_path, f"_MANIFEST.tmp-{os.getpid()}")
    with open(mtmp, "w") as fh:
        fh.write(vname)
    os.replace(mtmp, os.path.join(state_path, "_MANIFEST"))
    # sweep: keep the current and previous version, drop older + any
    # orphaned temp/quarantine dirs from dead writers
    keep = {vname}
    versions = sorted(
        d for d in os.listdir(state_path)
        if d.startswith("v") and "." not in d
    )
    if len(versions) >= 2:
        keep.add(versions[-2] if versions[-1] == vname else versions[-1])
    for d in os.listdir(state_path):
        full = os.path.join(state_path, d)
        if d.startswith("_"):
            continue
        if d in keep:
            continue
        if "." in d or d.startswith("v"):
            shutil.rmtree(full, ignore_errors=True)


def _merge_cdc_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_path: str,
    keys: list[str],
    order_col: str,
    tiebreak: str,
    op_col: str,
) -> None:
    """Delta-MERGE semantics (I/U/D) applied to the snapshot: per key
    the newest row by (order_col, tiebreak) across base ∪ batch wins;
    a winning 'D' removes the key. Order-insensitive across batches
    (base rows carry their order columns) and idempotent under
    checkpointed replay — re-applying a batch to the post-batch
    snapshot is a fixed point. This is q245's oracle-checked relation
    wired into the streaming transport; on a lakehouse deployment the
    body of this function becomes one `MERGE INTO` statement."""
    spark = batch_df.sparkSession
    base = read_merge_snapshot(spark, state_path)
    incoming = batch_df
    if base is not None:
        combined = base.unionByName(incoming)
    else:
        combined = incoming
    newest = latest_per_key(combined, keys, order_col, tiebreak)
    merged = newest.filter(F.col(op_col) != "D")
    _commit_snapshot(merged, state_path, batch_id)


def merge_cdc_sink(
    stream: DataFrame,
    state_path: str,
    keys: list[str],
    order_col: str,
    tiebreak: str,
    checkpoint_dir: str,
    op_col: str = "op",
) -> StreamingQuery:
    """Streaming CDC-MERGE sink (VERDICT r7 item #4): an insert/
    update/delete log stream maintained as an atomically-committed
    parquet snapshot with Delta-MERGE semantics. The stream must
    carry ``op_col`` ('I'/'U'/'D'), the merge keys, and the ordering
    columns. Crash-safe at every point of the commit protocol
    (tests/test_crash_recovery.py::test_merge_cdc_sink_*); swapping
    to a real Delta table is the format + one MERGE statement."""
    return (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: _merge_cdc_batch(
                bdf, bid, state_path, keys, order_col, tiebreak, op_col
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
