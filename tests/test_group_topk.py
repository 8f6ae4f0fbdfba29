"""group_topk: deterministic tie-breaks, ascending mode, k > group size."""

import pyarrow as pa
import pytest

from geomesa_nifi_ray.sampling import group_topk


def _t():
    return pa.table({
        "g": pa.array(["a", "a", "a", "a", "b", "b"]),
        "v": pa.array([5, 9, 9, 1, 3, 3], pa.int64()),
        "id": pa.array(["x4", "x2", "x1", "x3", "y2", "y1"]),
    })


@pytest.mark.usefixtures("ray_session")
def test_topk_desc_with_tiebreak():
    import ray.data

    out = group_topk(ray.data.from_arrow(_t()), "g", "v", "id", k=2
                     ).to_pandas().sort_values(["g", "id"])
    got = list(map(tuple, out[["g", "id"]].values.tolist()))
    # a: the two v=9 rows, tie broken by id asc (x1 before x2 — both kept);
    # b: both v=3 rows (k >= group size)
    assert got == [("a", "x1"), ("a", "x2"), ("b", "y1"), ("b", "y2")]


@pytest.mark.usefixtures("ray_session")
def test_topk_ascending_and_reshard_invariance():
    import ray.data

    t = _t()
    asc = group_topk(ray.data.from_arrow(t), "g", "v", "id", k=1,
                     descending=False).to_pandas()
    assert set(map(tuple, asc[["g", "id"]].values.tolist())) == \
        {("a", "x3"), ("b", "y1")}
    a = group_topk(ray.data.from_arrow(t), "g", "v", "id", k=2).to_pandas()
    b = group_topk(ray.data.from_arrow(t).repartition(4), "g", "v", "id",
                   k=2).to_pandas()
    key = ["g", "id", "v"]
    assert sorted(map(tuple, a[key].values.tolist())) == \
        sorted(map(tuple, b[key].values.tolist()))
    with pytest.raises(ValueError):
        group_topk(ray.data.from_arrow(t), "g", "v", "id", k=0)
