"""Spark-4 Python DataSource for the Everywhere-Hub poll/webhook feeds.

The reference's poll path is a driver-side HTTP GET with two
server-side pushdowns (`noEarlierThan`, `latestPositionOnly` —
/root/reference/task.ts:175-178); its webhook path is an unbounded
single-record stream (task.ts:103-163). Here both become first-class
Spark sources via the Python DataSource API (pyspark.sql.datasource),
which is the scale-correct upgrade over `poll_source`'s
driver-side fetch: partitions() models server pagination, so N
executors fetch N pages in parallel and the driver never materializes
the snapshot.

The transport is injectable: options carry a `path` pointing at a
JSONL "server snapshot" (tests, deterministic replay) — a real
deployment swaps `_fetch_page` for an HTTP GET with the same params.
No network dependency lives in this module.

Wire format per record (flat poll-response shape, task.ts:182-205):
    {"entityId": 1, "name": "N1", "alias": null, "deviceType": "t",
     "time": 1700000000000, "lon": 1.0, "lat": 2.0,
     "isEmergency": false}
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TRACK_SCHEMA = StructType(
    [
        StructField("entityId", LongType(), False),
        StructField("name", StringType(), True),
        StructField("alias", StringType(), True),
        StructField("deviceType", StringType(), True),
        StructField("time", LongType(), True),
        StructField("lon", DoubleType(), True),
        StructField("lat", DoubleType(), True),
        StructField("isEmergency", BooleanType(), True),
    ]
)

_FIELDS = [f.name for f in TRACK_SCHEMA.fields]


def _load_snapshot(path: str) -> list[dict]:
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _fetch_page(
    path: str, page: int, num_pages: int, no_earlier_than: int | None,
    latest_only: bool,
) -> Iterator[tuple]:
    """One server 'page': the slice of entities hashed to this page,
    with both reference pushdowns applied server-side (i.e. before
    anything crosses the wire — rows outside the retention horizon or
    superseded by a newer point per entity are never emitted).
    Null time under noEarlierThan is evicted (epoch-0 rule,
    task.ts:252)."""
    rows = [
        r for r in _load_snapshot(path)
        if int(r["entityId"]) % num_pages == page
    ]
    if no_earlier_than is not None:
        rows = [r for r in rows if (r.get("time") or 0) >= no_earlier_than]
    if latest_only:
        best: dict[int, dict] = {}
        for r in rows:
            k = int(r["entityId"])
            cur = best.get(k)
            # newest by (time, insertion order): later line wins ties,
            # mirroring the server's last-write-wins snapshot
            if cur is None or (r.get("time") or 0) >= (cur.get("time") or 0):
                best[k] = r
        rows = [best[k] for k in sorted(best)]
    for r in rows:
        yield tuple(r.get(f) for f in _FIELDS)


class _PagePartition(InputPartition):
    def __init__(self, page: int, num_pages: int):
        self.page = page
        self.num_pages = num_pages


class EverywhereHubReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.num_pages = int(options.get("numPartitions", 4))
        net = options.get("noEarlierThan")
        self.no_earlier_than = int(net) if net is not None else None
        self.latest_only = str(
            options.get("latestPositionOnly", "true")
        ).lower() == "true"

    def partitions(self) -> Sequence[InputPartition]:
        return [_PagePartition(i, self.num_pages) for i in range(self.num_pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        return _fetch_page(
            self.path,
            partition.page,
            partition.num_pages,
            self.no_earlier_than,
            self.latest_only,
        )


class EverywhereHubStreamReader(SimpleDataSourceStreamReader):
    """Webhook replay as a genuine streaming source with resumable
    offsets: offset = line index into the delivery log, so a restarted
    query resumes exactly after the last committed delivery (the
    at-least-once contract the reference gets from Lambda retries)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"line": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        rows = _load_snapshot(self.path)
        begin = int(start["line"])
        out = [tuple(r.get(f) for f in _FIELDS) for r in rows[begin:]]
        return iter(out), {"line": len(rows)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        rows = _load_snapshot(self.path)
        return iter(
            tuple(r.get(f) for f in _FIELDS)
            for r in rows[int(start["line"]) : int(end["line"])]
        )


class EverywhereHubDataSource(DataSource):
    """spark.read.format("everywhere_hub").option("path", ...) — batch
    poll snapshot; spark.readStream with the same format — webhook
    replay. Register once per session via register_everywhere_hub."""

    @classmethod
    def name(cls) -> str:
        return "everywhere_hub"

    def schema(self) -> StructType:
        return TRACK_SCHEMA

    def reader(self, schema: StructType) -> EverywhereHubReader:
        return EverywhereHubReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EverywhereHubStreamReader:
        return EverywhereHubStreamReader(self.options)


def register_everywhere_hub(spark) -> None:
    spark.dataSource.register(EverywhereHubDataSource)
