"""Spark-4 Python DataSource over deltalite tables — batch (with time
travel) and an incremental STREAMING source (round 11).

Completes the table-format story (sources/deltalite.py): a downstream
pipeline doesn't poll snapshots (the reference's consumer shape,
/root/reference/task.ts:103-115) — it tails the TRANSACTION LOG.
``spark.readStream.format("deltalite")`` turns every committed append
into a micro-batch, exactly like the Delta streaming source:

- Offsets are LOG VERSIONS ({"version": next-unread}): resumable,
  exactly-once with the checkpoint, no file listing anywhere.
- The driver plans partitions as the DATA-CHANGING FILES added in
  (start, end] — one InputPartition per added file; EXECUTORS read
  the parquet bytes (pyarrow), so the driver never materializes a
  row. Partition-column values (hive-encoded in the log's
  ``partitionValues``) are re-attached worker-side as constant
  columns.
- Append-only contract (Delta's default): a commit whose removes are
  dataChange=true (DELETE/MERGE/OVERWRITE rewrites) fails the stream
  loudly; ``skipChangeCommits=true`` skips those commits whole.
  OPTIMIZE commits (dataChange=false) are always transparent — the
  stream sees no rows from compaction, by construction.

The batch reader gives the same listing-free scan through the
DataSource API, with ``versionAsOf`` time travel.

Scale shape: driver work is O(log actions per trigger); row bytes
move scan-side on executors, one task per file — the same fan-out a
native Delta source produces."""

from __future__ import annotations

import json
import os

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str, partition_values: dict):
        self.path = path
        self.partition_values = partition_values


def _read_file_with_partitions(
    path: str, partition_values: dict, schema: StructType
):
    """Executor-side: read one parquet file, re-attach hive partition
    columns as constants typed per the table schema, emit Arrow
    batches in schema column order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    arrow_schema = to_arrow_schema(schema)
    tbl = pq.read_table(path)
    n = tbl.num_rows
    cols = []
    for f in arrow_schema:
        if f.name in partition_values:
            v = partition_values[f.name]
            if v is None:
                arr = pa.nulls(n, f.type)
            else:
                arr = pa.array([v] * n, pa.string()).cast(f.type)
            cols.append(arr)
        else:
            cols.append(tbl.column(f.name).cast(f.type))
    out = pa.table(cols, names=[f.name for f in arrow_schema])
    yield from out.to_batches()


def _log_path(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def _list_versions(table_path: str) -> list:
    lp = _log_path(table_path)
    if not os.path.isdir(lp):
        return []
    return sorted(
        int(f[:20])
        for f in os.listdir(lp)
        if f.endswith(".json") and f[:20].isdigit()
    )


def _read_commit(table_path: str, version: int) -> list:
    with open(os.path.join(_log_path(table_path), f"{version:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _table_schema(table_path: str) -> StructType:
    """Latest metaData's schema, replayed cheaply from the log tail."""
    for v in reversed(_list_versions(table_path)):
        for a in _read_commit(table_path, v):
            if "metaData" in a:
                return StructType.fromJson(json.loads(a["metaData"]["schemaString"]))
    raise ValueError(f"no metaData action found in {table_path}")


class DeltaliteBatchReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.version = (
            int(options["versionAsOf"]) if "versionAsOf" in options else None
        )
        self._schema = schema

    def partitions(self) -> Sequence[InputPartition]:
        # snapshot replay without importing Spark-side classes into
        # the serialized reader: adds minus removes over the log
        files: dict = {}
        versions = _list_versions(self.path)
        if not versions:
            raise FileNotFoundError(f"not a deltalite table: {self.path}")
        target = versions[-1] if self.version is None else self.version
        for v in versions:
            if v > target:
                break
            for a in _read_commit(self.path, v):
                if "add" in a:
                    files[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    files.pop(a["remove"]["path"], None)
        return [
            _FilePartition(
                os.path.join(self.path, rel),
                files[rel].get("partitionValues", {}),
            )
            for rel in sorted(files)
        ]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_file_with_partitions(
            partition.path, partition.partition_values, self._schema
        )


class DeltaliteStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.starting_version = int(options.get("startingVersion", 0))
        self.skip_change_commits = (
            str(options.get("skipChangeCommits", "false")).lower() == "true"
        )
        self._schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.path)
        return {"version": (versions[-1] + 1) if versions else 0}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        out = []
        for v in range(int(start["version"]), int(end["version"])):
            actions = _read_commit(self.path, v)
            adds = [
                a["add"] for a in actions
                if "add" in a and a["add"].get("dataChange", True)
            ]
            data_removes = [
                a["remove"] for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            if data_removes:
                if self.skip_change_commits:
                    continue  # Delta semantics: skip the WHOLE commit
                raise ValueError(
                    f"version {v} rewrites data (DELETE/MERGE/OVERWRITE); "
                    "the streaming source is append-only — set "
                    "skipChangeCommits=true to skip such commits, or "
                    "consume table_changes() for row-level CDF"
                )
            out.extend(
                _FilePartition(
                    os.path.join(self.path, a["path"]),
                    a.get("partitionValues", {}),
                )
                for a in adds
            )
        return out

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _read_file_with_partitions(
            partition.path, partition.partition_values, self._schema
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint


class DeltaliteDataSource(DataSource):
    """``spark.read.format("deltalite").option("path", p)`` — batch
    snapshot (``versionAsOf`` for time travel); ``spark.readStream``
    with the same format — the incremental log-tail source."""

    @classmethod
    def name(cls) -> str:
        return "deltalite"

    def schema(self) -> StructType:
        return _table_schema(self.options["path"])

    def reader(self, schema: StructType) -> DeltaliteBatchReader:
        return DeltaliteBatchReader(self.options, schema)

    def streamReader(self, schema: StructType) -> DeltaliteStreamReader:
        return DeltaliteStreamReader(self.options, schema)


def register_deltalite_source(spark) -> None:
    spark.dataSource.register(DeltaliteDataSource)
