"""Geometry column functions (reference F2 parity, SURVEY §2.A).

The reference's framework bundles turf geometry helpers (destination
point, point-on-feature, coordinate ops — package-lock.json:1564-1569).
Spark has no geodesic built-ins, so these are Arrow-batched pandas UDFs
doing vectorized numpy spherical trig — the sanctioned Python path
(one vectorized batch per Arrow chunk, never per-row Python).

UDF objects are built lazily (pandas_udf with a DDL-string return type
needs an active SparkSession to parse it, so decorating at import time
breaks sessionless imports).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

EARTH_RADIUS_KM = 6371.0088


@functools.lru_cache(maxsize=None)
def _haversine_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _h(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series) -> pd.Series:
        p1, p2 = np.radians(lat1.to_numpy()), np.radians(lat2.to_numpy())
        dp = p2 - p1
        dl = np.radians(lon2.to_numpy() - lon1.to_numpy())
        a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
        return pd.Series(2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a)))

    return _h


def haversine_km(lon1, lat1, lon2, lat2):
    """Great-circle distance in km between (lon1,lat1) and (lon2,lat2)."""
    return _haversine_udf()(lon1, lat1, lon2, lat2)


@functools.lru_cache(maxsize=None)
def _destination_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<lon: double, lat: double>")
    def _d(
        lon: pd.Series, lat: pd.Series, bearing_deg: pd.Series, dist_km: pd.Series
    ) -> pd.DataFrame:
        p1 = np.radians(lat.to_numpy())
        l1 = np.radians(lon.to_numpy())
        brng = np.radians(bearing_deg.to_numpy())
        d = dist_km.to_numpy() / EARTH_RADIUS_KM
        p2 = np.arcsin(np.sin(p1) * np.cos(d) + np.cos(p1) * np.sin(d) * np.cos(brng))
        l2 = l1 + np.arctan2(
            np.sin(brng) * np.sin(d) * np.cos(p1),
            np.cos(d) - np.sin(p1) * np.sin(p2),
        )
        lon_out = (np.degrees(l2) + 540.0) % 360.0 - 180.0
        return pd.DataFrame({"lon": lon_out, "lat": np.degrees(p2)})

    return _d


def destination_point(lon, lat, bearing_deg, dist_km):
    """Point reached from (lon,lat) travelling dist_km on bearing_deg
    (spherical earth) — turf `destination` semantics."""
    return _destination_udf()(lon, lat, bearing_deg, dist_km)


@functools.lru_cache(maxsize=None)
def _bearing_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _b(lon1: pd.Series, lat1: pd.Series, lon2: pd.Series, lat2: pd.Series) -> pd.Series:
        p1, p2 = np.radians(lat1.to_numpy()), np.radians(lat2.to_numpy())
        dl = np.radians(lon2.to_numpy() - lon1.to_numpy())
        y = np.sin(dl) * np.cos(p2)
        x = np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl)
        return pd.Series((np.degrees(np.arctan2(y, x)) + 360.0) % 360.0)

    return _b


def initial_bearing_deg(lon1, lat1, lon2, lat2):
    return _bearing_udf()(lon1, lat1, lon2, lat2)
