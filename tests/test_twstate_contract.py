"""transformWithStateInPandas ↔ applyInPandasWithState drift guard —
round 10 (VERDICT r9 item #7).

The RUNTIME equivalence of the two stateful device caches is
protobuf-blocked in this container (see tests/test_streaming.py's
loud skip + tools/verify_twstate.py for equipped hosts). What CAN be
verified here, and what this module pins so the implementations can't
drift apart silently:

1. configuration contract — both builders are invoked with captured
   kwargs (no stream runs, no protobuf import): same output schema
   object, update output mode on both, ProcessingTime time mode vs
   NoTimeout timeout, and the processor registering its single value
   state as ("latest", DEVICE_STATE_SCHEMA, ttl passthrough);
2. semantic equivalence of the PYTHON BODIES — the per-key logic of
   `_device_cache_fn` and `DeviceCacheProcessor.handleInputRows` is
   plain pandas; a fake GroupState / ValueState pair drives both over
   hypothesis-generated micro-batch sequences and asserts identical
   emissions after every batch and identical final state.

Together with verify_twstate.py (which proves the wire path on a
protobuf-equipped cluster), drift in either the wiring or the logic
is caught — here, per commit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_everywhere_hub_spark.streaming import jobs


# ---------------------------------------------------------------------------
# fakes
# ---------------------------------------------------------------------------


class FakeGroupState:
    """Just enough of pyspark's GroupState for _device_cache_fn."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        assert self._val is not None
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def setTimeoutDuration(self, ms):
        pass


class FakeValueState:
    """Just enough of the StatefulProcessor ValueState handle."""

    def __init__(self):
        self._val = None

    def exists(self):
        return self._val is not None

    def get(self):
        assert self._val is not None
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def clear(self):
        self._val = None


class FakeHandle:
    """Records getValueState registrations made by init()."""

    def __init__(self):
        self.registrations = []
        self.state = FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.registrations.append((name, schema, ttlDurationMs))
        return self.state


# ---------------------------------------------------------------------------
# 1. configuration contract (captured kwargs — no stream, no protobuf)
# ---------------------------------------------------------------------------


class _CaptureGrouped:
    """Stands in for GroupedData: records the stateful-API kwargs."""

    def __init__(self, sink):
        self._sink = sink

    def applyInPandasWithState(self, fn, **kw):
        self._sink["legacy"] = dict(kw, fn=fn)
        return None

    def transformWithStateInPandas(self, processor, **kw):
        self._sink["tw"] = dict(kw, processor=processor)
        return None


class _CaptureDF:
    def __init__(self, sink):
        self._sink = sink

    def groupBy(self, *cols):
        assert cols == ("user_id",), cols
        return _CaptureGrouped(self._sink)


def test_builder_config_contract():
    sink: dict = {}
    jobs.stateful_device_cache(_CaptureDF(sink))
    jobs.twstate_device_cache(_CaptureDF(sink), ttl_ms=12345)

    legacy, tw = sink["legacy"], sink["tw"]
    # identical output schema OBJECT (not a lookalike copy)
    assert legacy["outputStructType"] is jobs.DEVICE_OUTPUT_SCHEMA
    assert tw["outputStructType"] is jobs.DEVICE_OUTPUT_SCHEMA
    assert legacy["stateStructType"] is jobs.DEVICE_STATE_SCHEMA
    # both emit in update mode
    assert legacy["outputMode"] == tw["outputMode"] == "update"
    # legacy: explicit NoTimeout; successor: ProcessingTime time mode
    # (TTL is store-native there, not timer-driven)
    from pyspark.sql.streaming.state import GroupStateTimeout

    assert legacy["timeoutConf"] == GroupStateTimeout.NoTimeout
    assert tw["timeMode"] == "ProcessingTime"

    # the processor registers exactly one value state: the same tuple
    # layout the legacy twin persists, with the ctor TTL passed through
    handle = FakeHandle()
    tw["processor"].init(handle)
    assert handle.registrations == [
        ("latest", jobs.DEVICE_STATE_SCHEMA, 12345)
    ]
    handle2 = FakeHandle()
    jobs.DeviceCacheProcessor(None).init(handle2)
    assert handle2.registrations == [("latest", jobs.DEVICE_STATE_SCHEMA, None)]


def test_output_columns_match_schema():
    """Both bodies emit pandas frames whose columns equal
    DEVICE_OUTPUT_SCHEMA's field names, in order."""
    pdf = _events_pdf([(7, 1_000_000, "a", 1.5)])
    want = [f.name for f in jobs.DEVICE_OUTPUT_SCHEMA.fields]

    gs = FakeGroupState()
    (out_legacy,) = list(jobs._device_cache_fn((42,), [pdf], gs))
    assert list(out_legacy.columns) == want

    proc = jobs.DeviceCacheProcessor(None)
    proc.init(FakeHandle())
    (out_tw,) = list(proc.handleInputRows((42,), [pdf], None))
    assert list(out_tw.columns) == want


# ---------------------------------------------------------------------------
# 2. semantic equivalence of the python bodies
# ---------------------------------------------------------------------------


def _events_pdf(rows):
    """rows: [(event_id, ts_us, event_type, value)] → input-shaped pdf."""
    return pd.DataFrame(
        {
            "user_id": [42] * len(rows),
            "event_id": np.array([r[0] for r in rows], np.int64),
            "ts": pd.to_datetime(
                np.array([r[1] for r in rows], np.int64), unit="us"
            ).astype("datetime64[us]"),
            "event_type": [r[2] for r in rows],
            "value": np.array([r[3] for r in rows], np.float64),
        }
    )


def _emission_key(pdf):
    """(event_id, ts_us, event_type, value) of the single emitted row."""
    assert len(pdf) == 1
    r = pdf.iloc[0]
    return (
        int(r["event_id"]),
        int(pd.Timestamp(r["ts"]).value // 1000),
        str(r["event_type"]),
        float(r["value"]),
    )


@settings(max_examples=200, deadline=None)
@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 50),  # event_id (collisions on purpose)
                st.integers(0, 10) .map(lambda s: s * 1_000_000),  # ts_us
                st.sampled_from(["click", "view", "buy"]),
                st.floats(-10, 10, allow_nan=False),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bodies_equivalent_over_batch_sequences(batches):
    gs = FakeGroupState()
    handle = FakeHandle()
    proc = jobs.DeviceCacheProcessor(None)
    proc.init(handle)

    for batch in batches:
        pdf = _events_pdf(batch)
        legacy_out = list(jobs._device_cache_fn((42,), [pdf.copy()], gs))
        tw_out = list(proc.handleInputRows((42,), [pdf.copy()], None))
        assert len(legacy_out) == len(tw_out) == 1
        assert _emission_key(legacy_out[0]) == _emission_key(tw_out[0])
        # state parity after every micro-batch (same persisted tuple)
        assert gs._val == handle.state._val

    # expiry parity: the processor clears state; legacy NoTimeout never
    # times out (TTL lives in the store) — after handleExpiredTimer the
    # twstate side must hold nothing
    list(proc.handleExpiredTimer((42,), None, None))
    assert not handle.state.exists()


def test_cross_batch_older_event_does_not_regress():
    """A later micro-batch carrying an OLDER (ts, event_id) must not
    displace the cached row, in either implementation."""
    gs = FakeGroupState()
    proc = jobs.DeviceCacheProcessor(None)
    handle = FakeHandle()
    proc.init(handle)

    first = [(10, 5_000_000, "click", 1.0)]
    stale = [(3, 1_000_000, "view", 2.0)]
    for batch in (first, stale):
        pdf = _events_pdf(batch)
        (l_out,) = list(jobs._device_cache_fn((42,), [pdf.copy()], gs))
        (t_out,) = list(proc.handleInputRows((42,), [pdf.copy()], None))
        assert _emission_key(l_out) == _emission_key(t_out)
    assert gs._val[0] == handle.state._val[0] == 10
