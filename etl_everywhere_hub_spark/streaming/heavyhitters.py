"""Streaming heavy hitters — sharded Misra-Gries as bounded keyed
state (the streaming twin of the exact two-pass batch form,
operators/sketches.py / q186).

Items hash-shard across a fixed shard count; each shard carries ONE
Misra-Gries summary (k counters) in `applyInPandasWithState`. Because
sharding is BY ITEM, an item's entire stream lands in exactly one
shard, so the per-shard MG guarantee lifts globally: any item with
true frequency > n_shard/k (hence any item > n_total/k) is present in
its shard's candidate set at every point in the stream. State is
O(shards * k) regardless of stream length or item cardinality — the
property that makes this the 100 TB-stream form, while the exact
recount (batch pass 2, q186) runs on the bounded candidate set only.

Determinism: each micro-batch accumulates ALL pandas chunks first,
aggregates counts, then merges into the summary with the classic
mergeable-summaries rule (combine counts; if more than k-1 entries
survive, subtract the k-th largest count and drop non-positives) with
a (count desc, item asc) total order — chunk split points cannot
affect the result (the batch-split invariant streaming/proximity.py
learned the hard way). Batch BOUNDARIES are part of MG semantics
(different batchings give different — equally valid — summaries); the
guarantee above holds for every batching, and that is what the test
asserts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", IntegerType()),
        StructField("bseq", LongType()),
        StructField("n_shard", LongType()),
        StructField("item", StringType()),
        StructField("count_lb", LongType()),
    ]
)
_HH_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
        StructField("bseq", LongType()),
    ]
)


def _mg_merge(counters: dict[str, int], batch: dict[str, int], k: int) -> dict[str, int]:
    """Merge batch counts into an MG summary, keeping < k entries:
    combine, then subtract the k-th largest combined count from all
    and drop non-positives (Agarwal et al., mergeable summaries).
    Total (count desc, item asc) order makes ties deterministic."""
    for item, c in batch.items():
        counters[item] = counters.get(item, 0) + c
    if len(counters) >= k:
        ordered = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
        thresh = ordered[k - 1][1]
        counters = {i: c - thresh for i, c in ordered[: k - 1] if c - thresh > 0}
    return counters


def streaming_heavy_hitters(
    events: DataFrame, item_col: str = "user_id", k: int = 32, shards: int = 8
) -> DataFrame:
    """Candidate heavy hitters over an event stream with O(shards*k)
    total state. Emits, per shard per micro-batch, the current
    candidate set (shard, bseq, n_shard, item, count_lb); the final
    summary is each shard's max-bseq emission. ``count_lb`` is the MG
    residual count (a lower bound on true in-shard frequency; true
    count <= count_lb + n_shard/k)."""

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            items, counts, n, bseq = state.get
            counters = dict(zip(items, (int(c) for c in counts)))
        else:
            counters, n, bseq = {}, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks)
            batch = {
                str(i): int(c)
                for i, c in allrows["item"].value_counts().sort_index().items()
            }
            n += int(len(allrows))
            counters = _mg_merge(counters, batch, k)
        bseq += 1
        state.update(
            (list(counters.keys()), [int(v) for v in counters.values()], n, bseq)
        )
        out = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(out),
                "bseq": [bseq] * len(out),
                "n_shard": [n] * len(out),
                "item": [i for i, _ in out],
                "count_lb": [c for _, c in out],
            }
        )

    src = events.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(shards))
        .cast("int")
        .alias("shard"),
        F.col(item_col).cast("string").alias("item"),
    )
    return src.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
