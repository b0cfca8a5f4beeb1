"""Size-gated broadcast hints for corpus-statistic tables
(SCALE.md §4.2 fallback, VERDICT r3 item #5).

TF-IDF / BM25 / bigram-LM / vocab-coverage queries join a token or
bigram stream against count tables whose cardinality is the
VOCABULARY, not the corpus — Heaps-law sublinear, so normally a
broadcast. But nothing enforces that bound: a pathological corpus
(random strings, binary soup) grows the "vocab" linearly with the
corpus, and an unconditional ``F.broadcast`` hint would then OOM the
driver/executors at 100 TB.

``vocab_broadcast`` keeps the hint only while Catalyst's own
planning-time size estimate (``optimizedPlan().stats().sizeInBytes``
— zero jobs, the same signal autoBroadcastJoinThreshold consults)
stays under a byte ceiling. Over the ceiling it returns the frame
UNhinted: the join planfalls back to a shuffle equi-join, and AQE may
still convert it back to broadcast at runtime from TRUE sizes if the
estimate was pessimistic. Semantics are identical either way — a
hint never changes results (pinned by tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Planning-estimate ceiling (bytes) under which a statistics table
# keeps its explicit broadcast hint. 256 MiB default: comfortably
# executor-safe, far above any Heaps-law vocabulary at sane corpus
# sizes, far below a corpus-shaped table's estimate. Env-overridable;
# tests toggle the module attribute directly.
DEFAULT_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_VOCAB_BCAST_MAX_BYTES", str(256 * 1024 * 1024))
)


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's planning-time size estimate for a frame (no job)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())  # noqa: SLF001


def vocab_broadcast(stats: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Broadcast-hint ``stats`` only while its planning estimate is
    under ``max_bytes`` (default ``DEFAULT_MAX_BYTES``); else return it
    unhinted so the join shuffles (AQE re-decides from true sizes)."""
    limit = DEFAULT_MAX_BYTES if max_bytes is None else max_bytes
    return F.broadcast(stats) if estimated_size_bytes(stats) <= limit else stats
