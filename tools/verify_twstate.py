"""One-command transformWithStateInPandas equivalence verification
(VERDICT r7 item #8 / COVERAGE.md ledger item 2).

The Spark-4 StatefulProcessor device cache
(``streaming/jobs.py:twstate_device_cache``) is implemented but cannot
be *executed* in this container: transformWithState's state-server
protocol imports ``pyspark.sql.streaming.proto.StateMessage_pb2``,
which needs the ``google.protobuf`` runtime, absent here (no network;
no wheel on disk — see tests/test_streaming.py for the vendoring
post-mortem). The applyInPandasWithState twin IS fully verified, so
the risk is confined to the newer API's wiring.

On any machine with protobuf installed this script is the whole
verification recipe:

    PYTHONPATH=/path/to/repo python tools/verify_twstate.py \
        [--sf /path/to/testdata/sf0.01]

It builds a vanilla local session, streams the events fixture through
BOTH stateful caches (transformWithStateInPandas and
applyInPandasWithState) and the batch window formulation, and asserts
the three latest-per-key results are identical. Exit codes: 0 = all
three agree, 1 = mismatch (prints the first differing key),
2 = protobuf missing (environment cannot run the check — the same
condition tests/test_streaming.py skips on, reported loudly here).
"""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def protobuf_available() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def main(argv: list[str]) -> int:
    sf = "/root/testdata/sf0.01"
    if "--sf" in argv:
        sf = argv[argv.index("--sf") + 1]
    if not protobuf_available():
        print(
            "SKIP (exit 2): google.protobuf is not importable in this "
            "environment.\n"
            "transformWithStateInPandas cannot start its state-server "
            "protocol without it\n"
            "(pyspark.sql.streaming.proto.StateMessage_pb2 -> "
            "ModuleNotFoundError: google).\n"
            "Run this script on any protobuf-equipped cluster/venv:\n"
            "    pip install protobuf && "
            "PYTHONPATH=<repo> python tools/verify_twstate.py --sf <fixtures>"
        )
        return 2

    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.operators.windows import latest_per_key
    from etl_everywhere_hub_spark.session import get_spark
    from etl_everywhere_hub_spark.streaming import jobs

    spark = get_spark("verify-twstate", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def latest(df):
        return {
            r["user_id"]: (r["event_id"], r["ts"])
            for r in latest_per_key(df, ["user_id"], "ts", "event_id").collect()
        }

    tw = latest(
        jobs.run_to_table(
            jobs.twstate_device_cache(jobs.stream_events(spark, sf)),
            output_mode="update",
        )
    )
    legacy = latest(
        jobs.run_to_table(
            jobs.stateful_device_cache(jobs.stream_events(spark, sf)),
            output_mode="update",
        )
    )
    ev = spark.read.parquet(f"{sf}/events.parquet")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    batch = latest(ev.select("user_id", "event_id", "ts", "event_type", "value"))

    ok = tw == legacy == batch and len(tw) > 0
    if not ok:
        bad = next(
            (
                k
                for k in set(tw) | set(legacy) | set(batch)
                if not (tw.get(k) == legacy.get(k) == batch.get(k))
            ),
            None,
        )
        print(
            f"FAIL: latest-per-key diverges at user_id={bad}: "
            f"twstate={tw.get(bad)} legacy={legacy.get(bad)} "
            f"batch={batch.get(bad)}"
        )
        return 1
    print(
        f"PASS: transformWithStateInPandas == applyInPandasWithState == "
        f"batch window on {len(tw)} keys at {sf}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
