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
from pyspark.sql import functions as F

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


# Reference F4: magnetic-declination correction (`geomagnetism` dep,
# package-lock.json:1575). The full WMM/IGRF spherical-harmonic series
# needs the published coefficient tables; the degree-1 (tilted centered
# dipole) truncation below uses only the three public IGRF-13 epoch-2020
# dipole Gauss coefficients and captures the first-order field. Unlike
# F2's pandas UDFs this is pure Column trig — JVM-side, whole-stage
# codegen, no Python round-trip — so it costs the same as any built-in
# at 100 TB.
IGRF13_G10_NT = -29404.8
IGRF13_G11_NT = -1450.9
IGRF13_H11_NT = 4652.5


def dipole_declination_deg(lat_deg, lon_deg):
    """Magnetic declination (degrees, east-positive) of the IGRF-13
    degree-1 dipole field at surface radius.

    B_r = 2[g10 cosθ + (g11 cosλ + h11 sinλ) sinθ],
    B_θ =  g10 sinθ − (g11 cosλ + h11 sinλ) cosθ,
    B_φ =  g11 sinλ − h11 cosλ,  with θ = colatitude, λ = longitude;
    D = atan2(east, north) = atan2(B_φ, −B_θ).
    """
    from pyspark.sql import functions as F

    theta = F.radians(F.lit(90.0) - lat_deg)
    lam = F.radians(lon_deg)
    g10, g11, h11 = (F.lit(v) for v in (IGRF13_G10_NT, IGRF13_G11_NT, IGRF13_H11_NT))
    eq = g11 * F.cos(lam) + h11 * F.sin(lam)
    b_theta = g10 * F.sin(theta) - eq * F.cos(theta)
    b_phi = g11 * F.sin(lam) - h11 * F.cos(lam)
    return F.degrees(F.atan2(b_phi, -b_theta))


def haversine_km_col(lon1, lat1, lon2, lat2):
    """Great-circle distance as a pure Column expression — the
    production path. Same formula as haversine_km's pandas UDF, but
    it runs inside whole-stage codegen: no Arrow transfer, no Python
    worker, fuses with the surrounding projection. Keep the pandas
    version for parity testing; use this one in pipelines."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2) - F.radians(lat1)
    dlon = F.radians(lon2) - F.radians(lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def destination_point_col(lon, lat, bearing_deg, dist_km):
    """Destination point as pure Column trig — the codegen production
    twin of destination_point's pandas UDF (same spherical formula;
    the UDF stays for parity testing). Returns struct<lon, lat>."""
    p1 = F.radians(lat)
    l1 = F.radians(lon)
    brng = F.radians(bearing_deg)
    d = dist_km / EARTH_RADIUS_KM
    p2 = F.asin(
        F.sin(p1) * F.cos(d) + F.cos(p1) * F.sin(d) * F.cos(brng)
    )
    l2 = l1 + F.atan2(
        F.sin(brng) * F.sin(d) * F.cos(p1),
        F.cos(d) - F.sin(p1) * F.sin(p2),
    )
    lon_out = (F.degrees(l2) + 540.0) % 360.0 - 180.0
    return F.struct(lon_out.alias("lon"), F.degrees(p2).alias("lat"))


# --- turf geometry completion (F2): ellipse / sector / truncate /
# point-on-feature. All pure Column trig — JVM-side, whole-stage
# codegen, zero Python in the row path (the reference's framework gets
# these from @turf/* — package-lock.json:1564-1569). Ring vertices are
# generated with sequence+transform, so a 64-vertex ellipse is one
# array expression per row, not 64 rows.


def truncate_coords_col(lon, lat, precision: int = 6):
    """turf `truncate`: snap coordinates to `precision` decimals.
    Follows JS Math.round semantics (floor(x*f + 0.5)/f — half always
    rounds toward +inf, also for negatives), which is also exactly
    reproducible in any engine. Returns struct<lon, lat>."""
    f = F.lit(float(10**precision))
    return F.struct(
        (F.floor(lon * f + 0.5) / f).alias("lon"),
        (F.floor(lat * f + 0.5) / f).alias("lat"),
    )


def ellipse_ring_col(lon, lat, a_km, b_km, tilt_deg=None, steps: int = 12):
    """turf `ellipse`: closed polygon ring approximating the geodesic
    ellipse centered at (lon, lat) with semi-axes a_km (along
    tilt_deg) and b_km. Vertex i sits at bearing tilt + θ_i at the
    polar-equation radius r(θ) = ab / sqrt((b cosθ)² + (a sinθ)²);
    each vertex is a spherical destination point (the codegen
    destination_point_col). Returns array<struct<lon, lat>> of
    steps+1 vertices (last ≈ first closes the ring)."""
    tilt = tilt_deg if tilt_deg is not None else F.lit(0.0)

    def vertex(i):
        theta = i.cast("double") * F.lit(360.0 / steps)
        thr = F.radians(theta)
        r = (a_km * b_km) / F.sqrt(
            (b_km * F.cos(thr)) ** 2 + (a_km * F.sin(thr)) ** 2
        )
        return destination_point_col(lon, lat, theta + tilt, r)

    return F.transform(F.sequence(F.lit(0), F.lit(steps)), vertex)


def sector_ring_col(lon, lat, radius_km, bearing1, bearing2, steps: int = 12):
    """turf `sector`: pie-slice polygon from bearing1 to bearing2 at
    radius_km — center, the arc (steps+1 points), back to center.
    The CoT shape primitive sibling connectors emit for field-of-view
    wedges. Returns array<struct<lon, lat>> (closed ring)."""
    arc = F.transform(
        F.sequence(F.lit(0), F.lit(steps)),
        lambda k: destination_point_col(
            lon,
            lat,
            bearing1 + (bearing2 - bearing1) * k.cast("double") / F.lit(float(steps)),
            radius_km,
        ),
    )
    center = F.array(
        F.struct(lon.cast("double").alias("lon"), lat.cast("double").alias("lat"))
    )
    return F.concat(center, arc, center)


def point_in_ring_col(lon, lat, ring):
    """Planar even-odd ray cast (turf booleanPointInPolygon
    semantics — turf is planar here too): count edges of the CLOSED
    ring crossing the horizontal ray from the point, odd → inside.
    One aggregate over the edge list, all codegen. Points exactly on
    an edge follow raw IEEE comparison (same convention both
    engines)."""
    n = F.size(ring)
    edge = lambda i: (  # noqa: E731
        F.when(
            ((F.get(ring, i)["lat"] > lat) != (F.get(ring, i + 1)["lat"] > lat))
            & (
                lon
                < (F.get(ring, i + 1)["lon"] - F.get(ring, i)["lon"])
                * (lat - F.get(ring, i)["lat"])
                / (F.get(ring, i + 1)["lat"] - F.get(ring, i)["lat"])
                + F.get(ring, i)["lon"]
            ),
            1,
        ).otherwise(0)
    )
    crossings = F.aggregate(
        F.sequence(F.lit(0), n - 2), F.lit(0), lambda acc, i: acc + edge(i)
    )
    return crossings % 2 == 1


def point_on_feature_col(ring):
    """turf `pointOnFeature` for a polygon ring: the vertex-centroid
    if it falls inside the ring, else the ring vertex nearest to the
    centroid (planar distance, lowest index wins ties) — a point
    GUARANTEED on the feature, which the centroid of a concave ring
    is not. Returns struct<lon, lat, inside: boolean>."""
    verts = F.slice(ring, 1, F.size(ring) - 1)  # drop closing vertex
    n = F.size(verts).cast("double")
    cx = F.aggregate(verts, F.lit(0.0), lambda a, v: a + v["lon"]) / n
    cy = F.aggregate(verts, F.lit(0.0), lambda a, v: a + v["lat"]) / n
    inside = point_in_ring_col(cx, cy, ring)
    ranked = F.array_sort(
        F.zip_with(
            verts,
            F.sequence(F.lit(1), F.size(verts)),
            lambda v, i: F.struct(
                # plain multiplication, not pow(): exact IEEE ops that
                # reproduce bit-identically in any engine (d2 decides a
                # SORT, so an ulp of libm pow drift could flip ties)
                (
                    (v["lon"] - cx) * (v["lon"] - cx)
                    + (v["lat"] - cy) * (v["lat"] - cy)
                ).alias("d2"),
                i.alias("i"),
                v["lon"].alias("lon"),
                v["lat"].alias("lat"),
            ),
        )
    )
    best = F.get(ranked, 0)
    return F.struct(
        F.when(inside, cx).otherwise(best["lon"]).alias("lon"),
        F.when(inside, cy).otherwise(best["lat"]).alias("lat"),
        inside.alias("inside"),
    )
