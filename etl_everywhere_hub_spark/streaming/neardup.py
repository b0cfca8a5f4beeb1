"""Streaming near-duplicate detection: MinHash-LSH over an unbounded
document stream (SURVEY.md §2.B LLM-ops × streaming).

The batch pipeline (operators/dedup.py) answers "which docs in this
corpus are near-dups"; a training-data INGEST pipeline needs the
incremental question — "is this arriving doc a near-dup of anything
seen so far". Same math, restructured for streams:

- Signatures become per-row, map-only: the shingle set is an array
  column, so every minhash is `array_min(transform(...))` — no
  groupBy, no shuffle, no state for signature building. Identical
  values to the batch wide-form (same md5 base, same affine family).
- Candidate generation becomes bucket-keyed STATE instead of a
  self-join: the stream is keyed by (band, band_key) and each bucket
  holds the docs previously hashed into it. A new arrival is compared
  against its bucket's history only — the streaming analogue of the
  band equi-join, O(bucket width) per doc, state sharded across
  executors by the bucket hash.

State is bounded the LSH way (buckets only collect near-identical
docs) plus an explicit per-bucket cap against adversarial/boilerplate
floods — the same first-to-break mitigation as SCALE.md item 1.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_everywhere_hub_spark.functions.hashing import md5_long
from etl_everywhere_hub_spark.functions.text import tokens
from etl_everywhere_hub_spark.operators.dedup import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
)

PAIR_SCHEMA = StructType(
    [
        StructField("a", LongType()),
        StructField("b", LongType()),
        StructField("sig_sim", DoubleType()),
    ]
)

_BUCKET_STATE_SCHEMA = StructType([StructField("members", StringType())])


def rowwise_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, sig: array<long>) with NO shuffle — works on streams.

    Bit-identical to operators.dedup.minhash_signatures (same shingle
    construction, md5 base, affine family); the min runs over the
    per-row shingle array instead of a groupBy. Docs with no shingles
    (< k tokens) are dropped, matching the batch pipeline where they
    never survive the shingle explode."""
    toks = docs.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("__toks")
    )
    n = F.size(F.col("__toks"))
    sh = F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, k)),
        )
    )
    with_h0 = toks.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(sh), lambda s: md5_long(s) % MINHASH_P
        ).alias("__h0"),
    ).filter(F.size("__h0") > 0)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("__h0"),
                    lambda h: (h * MINHASH_A[s] + MINHASH_B[s]) % MINHASH_P,
                )
            )
            for s in range(num_hashes)
        ]
    )
    return with_h0.select(F.col(id_col), sig.alias("sig"))


def band_keys(
    sigs: DataFrame, id_col: str = "doc_id", num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """(band, band_key, id, sig) — one row per (doc, band), keyed the
    same way as the batch lsh_candidate_pairs (md5 of the band's
    minhashes in seed order), so stream and batch bucket identically."""
    rpb = num_hashes // bands
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(F.col("sig"), s + 1).cast("string")
                        for s in range(b * rpb, (b + 1) * rpb)
                    ],
                )
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        F.col(id_col), F.col("sig"), F.explode(F.array(*structs)).alias("bb")
    ).select(
        F.col("bb.band").alias("band"),
        F.col("bb.band_key").alias("band_key"),
        F.col(id_col),
        "sig",
    )


def _bucket_fn(max_bucket: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        members: list[list] = (
            json.loads(state.get[0]) if state.exists else []
        )
        out_a, out_b, out_s = [], [], []
        # Accumulate every chunk BEFORE sorting (a group arrives as
        # multiple ~10k-row chunks): pair EMISSION is order-independent
        # (each new doc pairs against all prior members), but which
        # docs are RETAINED once max_bucket trips is order-dependent —
        # one global doc_id sort keeps that deterministic under any
        # batch split (same fix as streaming/proximity.py, ADVICE r3).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            for row in allrows.itertuples(index=False):
                did = int(row.doc_id)
                sig = [int(x) for x in row.sig]
                if any(did == m[0] for m in members):
                    continue  # replay/duplicate delivery: already seen
                for mid, msig in members:
                    eq = sum(1 for x, y in zip(sig, msig) if x == y)
                    lo, hi = min(did, mid), max(did, mid)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_s.append(eq / len(sig))
                if len(members) < max_bucket:
                    members.append([did, sig])
        state.update((json.dumps(members),))
        if out_a:
            yield pd.DataFrame({"a": out_a, "b": out_b, "sig_sim": out_s})

    return fn


def streaming_near_dup_pairs(
    doc_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a < b, with signature similarity)
    from an unbounded document stream. Each doc is checked against the
    history of its LSH buckets only; emit-once per (pair, band) — the
    consumer dedupes across bands (batch readout: distinct; streaming
    readout: dropDuplicates).

    max_bucket caps state against boilerplate floods: past the cap a
    bucket stops ACCUMULATING but keeps matching against its existing
    members (new docs still pair with the retained history)."""
    sigs = rowwise_signatures(doc_stream, text_col, id_col, k, num_hashes)
    keyed = band_keys(sigs, id_col, num_hashes, bands)
    return keyed.groupBy("band", "band_key").applyInPandasWithState(
        _bucket_fn(max_bucket),
        outputStructType=PAIR_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
