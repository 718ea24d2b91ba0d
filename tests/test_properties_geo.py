"""Hypothesis property tests for the geo functions (functions/ch.py)
against independent Python references.

geohash_encode is closed-form quantize-then-interleave; the reference
here is the CLASSIC per-bit bisection algorithm (Niemeyer geohash) —
a genuinely different formulation, so agreement pins the arithmetic,
including the +180/+90 edge clamp.  geohash_decode must land on the
cell center (within half a cell of the encoded point) and NULL out
malformed input.  great_circle_distance is compared to a Python
haversine at CH's 6371000 m radius.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Classic bisection geohash: interleave lon/lat bits MSB-first,
    lon on even global bit positions."""
    lon_lo, lon_hi = -180.0, 180.0
    lat_lo, lat_hi = -90.0, 90.0
    out, val, even = [], 0, True
    nbits = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                val = val * 2 + 1
                lon_lo = mid
            else:
                val = val * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                val = val * 2 + 1
                lat_lo = mid
            else:
                val = val * 2
                lat_hi = mid
        even = not even
        nbits += 1
        if nbits == 5:
            out.append(_B32[val])
            val, nbits = 0, 0
    return "".join(out)


def _off_boundary(span: float, lo: float):
    """Reject values within float-rounding reach of a cell boundary of
    the FINEST grid (30 bits): there the quantizer product and the
    bisection midpoint comparisons legitimately round to different
    cells (both are valid float formulations of the same cell walls).
    True boundary VALUES agree (floor and >= both pick the upper
    cell) and are covered by the curated specials; a near-boundary
    value that merely ROUNDS onto the boundary inside the quantizer
    product (e.g. lon = -1e-211, where 180 + lon == 180.0) does NOT
    agree, so the filter keeps no exactness escape hatch."""

    def ok(v: float) -> bool:
        frac = (v - lo) / span * (2.0 ** 30)
        return abs(frac - round(frac)) > 1e-3

    return ok


_LON = st.one_of(
    st.floats(min_value=-180.0, max_value=180.0, allow_nan=False).filter(
        _off_boundary(360.0, -180.0)
    ),
    st.sampled_from([-180.0, 0.0, 180.0, 179.9999, -179.9999]),
)
_LAT = st.one_of(
    st.floats(min_value=-90.0, max_value=90.0, allow_nan=False).filter(
        _off_boundary(180.0, -90.0)
    ),
    st.sampled_from([-90.0, 0.0, 90.0, 89.9999, -89.9999]),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(_LON, _LAT), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=12),
)
def test_geohash_encode_matches_bisection_reference(spark, points, precision):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(points)],
        "i long, lon double, lat double",
    )
    got = {
        r["i"]: r["gh"]
        for r in df.select(
            "i", ch.geohash_encode("lon", "lat", precision).alias("gh")
        ).collect()
    }
    for i, (lon, lat) in enumerate(points):
        want = _ref_geohash(lon, lat, precision)
        assert got[i] == want, (lon, lat, precision, got[i], want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(_LON, _LAT), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=12),
)
def test_geohash_decode_roundtrip_within_half_cell(spark, points, precision):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

    df = spark.createDataFrame(
        [(i, lon, lat) for i, (lon, lat) in enumerate(points)],
        "i long, lon double, lat double",
    )
    enc = df.select(
        "i", "lon", "lat", ch.geohash_encode("lon", "lat", precision).alias("gh")
    )
    dlon, dlat = ch.geohash_decode("gh", precision)
    got = {
        r["i"]: (r["dlon"], r["dlat"])
        for r in enc.select(
            "i", dlon.alias("dlon"), dlat.alias("dlat")
        ).collect()
    }
    nbits = 5 * precision
    cell_lon = 360.0 / (2 ** ((nbits + 1) // 2))
    cell_lat = 180.0 / (2 ** (nbits // 2))
    for i, (lon, lat) in enumerate(points):
        glon, glat = got[i]
        # the cell center is within half a cell of any point in the
        # cell; the +180/+90 edge clamps into the last cell
        assert abs(glon - min(lon, 180.0 - cell_lon / 2)) <= cell_lon / 2 + 1e-9
        assert abs(glat - min(lat, 90.0 - cell_lat / 2)) <= cell_lat / 2 + 1e-9


def test_geohash_decode_nulls_on_malformed(spark):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

    df = spark.createDataFrame(
        [(1, "ezs42x"), (2, "ez a42"), (3, "e"), (4, "ilovex"), (5, None)],
        "i int, gh string",
    )
    dlon, dlat = ch.geohash_decode("gh", 6)
    rows = {r["i"]: (r["lon"], r["lat"]) for r in df.select(
        "i", dlon.alias("lon"), dlat.alias("lat")
    ).collect()}
    assert rows[1][0] is not None  # valid 6-char geohash decodes
    # space, too-short, 'i'/'l' (not in the geohash alphabet), NULL
    for i in (2, 3, 4, 5):
        assert rows[i] == (None, None), (i, rows[i])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.tuples(_LON, _LAT, _LON, _LAT), min_size=1, max_size=10))
def test_great_circle_distance_matches_haversine(spark, quads):
    from yc_data_transfer_clickhouse_from_yandex_metrica_spark.functions import ch

    df = spark.createDataFrame(
        [(i, *q) for i, q in enumerate(quads)],
        "i long, lon1 double, lat1 double, lon2 double, lat2 double",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i",
            ch.great_circle_distance("lon1", "lat1", "lon2", "lat2").alias("d"),
        ).collect()
    }
    for i, (lon1, lat1, lon2, lat2) in enumerate(quads):
        p1, p2 = math.radians(lat1), math.radians(lat2)
        dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
        a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        want = 2 * 6_371_000.0 * math.asin(min(1.0, math.sqrt(a)))
        assert math.isclose(got[i], want, rel_tol=1e-9, abs_tol=1e-6), (
            quads[i],
            got[i],
            want,
        )
