"""Geometry kernels: WKT/WKB point converters (the reference's
``GeometryWktFieldConverter`` / ``GeometryWkbFieldConverter``,
SimpleFeatureRecordConverter.scala:427-441) and the Z2 space-filling-curve
index (encode, covering ranges, cover+refine bbox scan)."""

import sys

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")

from geomesa_nifi_ray import geometry as g


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    return lon, lat


def test_wkt_roundtrip(pts):
    lon, lat = pts
    w = g.wkt_point(lon, lat, decimals=6)
    x, y = g.parse_wkt_point(w)
    assert np.allclose(x.to_numpy(), lon, atol=5e-7)
    assert np.allclose(y.to_numpy(), lat, atol=5e-7)
    assert w[0].as_py().startswith("POINT (")


def test_wkt_null_coordinates_yield_null_geometry():
    w = g.wkt_point(pa.array([1.0, None, 3.0]), pa.array([2.0, 5.0, None]))
    assert w.to_pylist()[0] == "POINT (1.000000 2.000000)"
    assert w.to_pylist()[1] is None and w.to_pylist()[2] is None


def test_parse_wkt_malformed_rows_are_null():
    x, y = g.parse_wkt_point(["POINT (1.5 -2.5)", "LINESTRING (0 0, 1 1)",
                              "POINT(1 2)", None, "garbage"])
    assert x.to_pylist() == [1.5, None, None, None, None]
    assert y.to_pylist() == [-2.5, None, None, None, None]


def test_wkb_roundtrip_bit_exact(pts):
    lon, lat = pts
    b = g.wkb_point(lon, lat)
    x, y = g.parse_wkb_point(b)
    assert (x.to_numpy() == lon).all() and (y.to_numpy() == lat).all()
    raw = b[0].as_py()
    assert len(raw) == 21 and raw[:5] == b"\x01\x01\x00\x00\x00"
    # payload is little-endian IEEE doubles, per ISO WKB
    import struct
    assert struct.unpack("<dd", raw[5:]) == (lon[0], lat[0])


def test_wkb_rejects_non_point_input():
    with pytest.raises((ValueError, pa.ArrowInvalid)):
        g.parse_wkb_point(pa.array([b"\x00" * 20], type=pa.binary()))
    with pytest.raises(ValueError):
        g.parse_wkb_point(pa.array([b"\x00\x02\x00\x00\x00" + b"\x00" * 16]))


def test_z2_encode_matches_bitwise_reference(pts):
    lon, lat = pts
    bits = 16
    z = g.z2_encode(lon, lat, bits=bits).to_numpy()

    def slow(lo, la):
        ix = min(int(np.floor((lo + 180.0) / 360.0 * (1 << bits))), (1 << bits) - 1)
        iy = min(int(np.floor((la + 90.0) / 180.0 * (1 << bits))), (1 << bits) - 1)
        out = 0
        for i in range(bits):
            out |= ((ix >> i) & 1) << (2 * i)
            out |= ((iy >> i) & 1) << (2 * i + 1)
        return out

    for i in range(0, 5000, 97):
        assert z[i] == slow(lon[i], lat[i])


def test_z2_locality_monotone_in_cell():
    # all points inside one curve cell share the key prefix => one range
    lon = np.array([10.0, 10.01, 10.02])
    lat = np.array([45.0, 45.01, 45.02])
    z = g.z2_encode(lon, lat, bits=8).to_numpy()
    assert z[0] == z[1] == z[2]  # 8-bit cells are ~1.4 deg wide


@pytest.mark.parametrize("bbox", [
    (-30.0, 20.0, 10.0, 60.0),
    (-180.0, -90.0, 180.0, 90.0),       # whole world
    (-0.05, -0.05, 0.05, 0.05),         # tiny cross-origin box
    (170.0, 80.0, 180.0, 90.0),         # corner cell
    (200.0, 95.0, 210.0, 99.0),         # fully outside the domain
])
def test_z2_bbox_filter_equals_exact(pts, bbox):
    lon, lat = pts
    t = pa.table({"id": pa.array(range(len(lon)), type=pa.int64()),
                  "lon": pa.array(lon), "lat": pa.array(lat)})
    exact = g.bbox_filter(t, "lon", "lat", bbox)
    indexed = g.z2_bbox_filter(t, "lon", "lat", bbox, bits=16, max_ranges=32)
    assert indexed["id"].to_pylist() == exact["id"].to_pylist()


def test_z2_covering_ranges_budget_and_merge():
    r = g.z2_covering_ranges((-30.0, 20.0, 10.0, 60.0), bits=16, max_ranges=8)
    assert 1 <= len(r) <= 8
    assert r == sorted(r)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(r, r[1:]):
        assert a_hi + 1 < b_lo  # merged: no adjacent/overlapping ranges
    # whole world = the full contiguous key space, exactly one range
    world = g.z2_covering_ranges(g.Z2_BOUNDS, bits=16)
    assert world == [(0, (1 << 32) - 1)]


def test_converter_point_function(ray_session):
    import ray.data

    from geomesa_nifi_ray.convert import FieldSpec, RecordConverter

    t = pa.table({"x": pa.array([1.25, -3.5]), "y": pa.array([2.0, 4.75])})
    out = (ray.data.from_arrow(t)
           .map_batches(RecordConverter, batch_format="pyarrow",
                        fn_constructor_kwargs={"fields": [
                            FieldSpec("wkt", "point($x, $y, 2)")]},
                        concurrency=1)
           .to_pandas())
    assert sorted(out["wkt"]) == ["POINT (-3.50 4.75)", "POINT (1.25 2.00)"]


# ------------------------------------------------------------------- Z3


def test_z3_encode_matches_bitwise_reference(pts):
    lon, lat = pts
    rng = np.random.default_rng(13)
    ts = rng.integers(1_700_000_000_000_000, 1_706_000_000_000_000,
                      len(lon))
    bits = 12
    b_arr, z_arr = g.z3_encode(lon, lat, ts, bits=bits)
    b_np, z_np = b_arr.to_numpy(), z_arr.to_numpy()

    def slow(lo, la, tu):
        cells = 1 << bits
        ix = min(int(np.floor((lo + 180.0) / 360.0 * cells)), cells - 1)
        iy = min(int(np.floor((la + 90.0) / 180.0 * cells)), cells - 1)
        it = (int(tu) % g.WEEK_US) * cells // g.WEEK_US
        out = 0
        for i in range(bits):
            out |= (((ix >> i) & 1) << (3 * i)
                    | ((iy >> i) & 1) << (3 * i + 1)
                    | ((it >> i) & 1) << (3 * i + 2))
        return int(tu) // g.WEEK_US, out

    for i in range(0, len(lon), 131):
        assert (b_np[i], z_np[i]) == slow(lon[i], lat[i], ts[i])


def test_z3_negative_timestamps_key_as_null():
    # pre-1970 rows are outside the index domain: null key, like null ts
    # (one legacy row must not crash a scan); the raw quantizer still
    # enforces the domain for direct callers
    b, z = g.z3_encode(pa.array([0.0, 1.0]), pa.array([0.0, 1.0]),
                       pa.array([-1, 1_000_000], pa.int64()))
    assert b.null_count == 1 and z.null_count == 1
    assert b[1].is_valid and z[1].is_valid
    with pytest.raises(ValueError, match="non-negative"):
        g._quantize_time(np.array([-1]), bits=4)


def test_z3_bbox_time_filter_equals_exact(pts):
    import pyarrow.compute as pc

    lon, lat = pts
    rng = np.random.default_rng(17)
    ts = rng.integers(1_700_000_000_000_000, 1_706_000_000_000_000,
                      len(lon))
    t = pa.table({"id": pa.array(range(len(lon)), type=pa.int64()),
                  "lon": pa.array(lon), "lat": pa.array(lat),
                  "ts": pa.array(ts, type=pa.int64())})
    bbox = (-30.0, 20.0, 100.0, 80.0)
    t0, t1 = 1_701_000_000_000_000, 1_704_500_000_000_000  # spans bins
    exact = g.bbox_filter(t, "lon", "lat", bbox)
    exact = exact.filter(pc.and_(pc.greater_equal(exact["ts"], t0),
                                 pc.less(exact["ts"], t1)))
    for bits, mr in [(16, 64), (8, 16), (4, 8)]:
        got = g.z3_bbox_time_filter(t, "lon", "lat", "ts", bbox, t0, t1,
                                    bits=bits, max_ranges=mr)
        assert got["id"].to_pylist() == exact["id"].to_pylist(), (bits, mr)
    # empty interval
    assert g.z3_bbox_time_filter(t, "lon", "lat", "ts", bbox, t1, t1).num_rows == 0
