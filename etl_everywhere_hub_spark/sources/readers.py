"""Source layer: schema-enforced readers mirroring the reference's
ingestion edges (SURVEY.md §2.B sources/sinks).

The reference validates every wire payload against a runtime schema
and rejects failures (/root/reference/task.ts:110), with a DEBUG mode
that degrades to accept-anything (same line). Spark's reader modes map
1:1: FAILFAST = enforced, PERMISSIVE + corrupt-record column = DEBUG.

Two ingestion shapes:
- webhook push (task.ts:103-163): single JSON records → here either an
  in-memory batch (`webhook_batch`) or a streaming JSON dir replay
  (`webhook_replay_stream`).
- scheduled poll (task.ts:166-264): driver-side HTTP fetch →
  DataFrame. The fetch is injectable (`fetch_fn`) — no network in
  tests; pushdown params (noEarlierThan/latestPositionOnly,
  task.ts:177-178) travel to the source exactly like the reference.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def read_json_validated(
    spark: SparkSession,
    path: str,
    schema: StructType,
    debug: bool = False,
) -> DataFrame:
    """JSON source with enforced schema.

    debug=False → FAILFAST (reject like task.ts:110's TypeBox check);
    debug=True → PERMISSIVE with the raw payload preserved in
    _corrupt_record (the reference logs raw bodies when DEBUG,
    task.ts:116-118).
    """
    if debug:
        s = StructType(schema.fields + [StructField(CORRUPT_COL, StringType())])
        return (
            spark.read.schema(s)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def webhook_batch(
    spark: SparkSession, records: Sequence[dict], schema: StructType
) -> DataFrame:
    """One webhook delivery batch (the reference handles exactly one
    record per invocation, task.ts:103-115; we generalize to N)."""
    return spark.createDataFrame(records, schema)


def webhook_replay_stream(
    spark: SparkSession, json_dir: str, schema: StructType
) -> DataFrame:
    """Streaming replay of webhook deliveries from a JSON-lines dir —
    the deterministic test harness for the streaming pipeline."""
    return spark.readStream.schema(schema).json(json_dir)


def poll_source(
    spark: SparkSession,
    schema: StructType,
    fetch_fn: Callable[[dict], Sequence[dict]],
    now_ms: int,
    retention_ms: int = 3_600_000,
    latest_position_only: bool = True,
) -> DataFrame:
    """Scheduled-poll source with reference-faithful pushdown.

    Builds the same query params the reference pushes server-side
    (task.ts:175-178): `noEarlierThan = now - retention` (predicate
    pushdown) and `latestPositionOnly` (top-1-per-key pushdown), hands
    them to the injected fetch, and lifts the result into a DataFrame.
    Driver-side by design — the poll result is a bounded snapshot
    (newest point per entity), never bulk data.
    """
    params = {
        "noEarlierThan": now_ms - retention_ms,
        "latestPositionOnly": latest_position_only,
    }
    rows = list(fetch_fn(params))
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, schema)
