"""Measure the per-row-loop vs Arrow-RE2-vectorized crossover for the
extract kernel across document sizes (VERDICT r3 item #9's large-document
tier). Synthesizes markup-heavy docs at each size, times both
implementations on identical columns, verifies byte-identity, and prints
one JSON line per size plus the selected crossover. No Ray needed — the
kernel is a pure Arrow/Python batch function.

Run: python tools/text_kernel_crossover.py
"""

import json
import sys
import time

import pyarrow as pa

sys.path.insert(0, ".")

from geomesa_nifi_ray.text import (  # noqa: E402
    extract_text_batch,
    extract_text_batch_vectorized,
)

UNIT = (b"<div class='c'><p>Some text &amp; entities</p>"
        b"<script>var a='abcdefghij';</script><!-- note -->"
        + "line café  two ".encode() + b"</div>\n")   # ~140 B


def make_doc(size: int) -> bytes:
    reps = max(1, size // len(UNIT))
    return (UNIT * reps)[: max(size, len(UNIT))]


def bench(col: pa.Array, fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(col)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sizes = [1_024, 4_096, 16_384, 65_536, 262_144, 1_048_576]
    total_bytes = 8_000_000      # same total work per size tier
    out = []
    for size in sizes:
        n = max(2, total_bytes // size)
        doc = make_doc(size)
        col = pa.array([doc] * n, type=pa.large_binary())
        a = extract_text_batch(col, "loop")
        b = extract_text_batch_vectorized(col)
        assert a.to_pylist() == b.to_pylist(), f"divergence at {size}"
        reps = 3
        t_loop = bench(col, lambda c: extract_text_batch(c, "loop"), reps)
        t_vec = bench(col, extract_text_batch_vectorized, reps)
        row = {
            "doc_bytes": size,
            "rows": n,
            "loop_us_per_row": round(t_loop / n * 1e6, 1),
            "vec_us_per_row": round(t_vec / n * 1e6, 1),
            "loop_mb_per_s": round(total_bytes / t_loop / 1e6, 1),
            "vec_mb_per_s": round(total_bytes / t_vec / 1e6, 1),
            "winner": "vectorized" if t_vec < t_loop else "loop",
        }
        out.append(row)
        print(json.dumps(row))
    cross = next((r["doc_bytes"] for r in out if r["winner"] == "vectorized"),
                 None)
    print(json.dumps({"clean_markup_crossover_doc_bytes": cross}))

    # The crossover is by SHAPE, not size: Python re's non-greedy .*? is
    # worst-case quadratic on malformed markup, RE2 is linear-time.
    adversarial = {
        "nearmiss_script": b"<script>" + b"</scrip " * 30_000 + b"</script>t",
        "unclosed_scripts": (b"<script>x" + b"y" * 500) * 400,
        "nearmiss_comment": b"<!--" + b"-- >" * 40_000 + b"-->done",
    }
    for name, doc in adversarial.items():
        col = pa.array([doc] * 8, type=pa.large_binary())
        assert (extract_text_batch(col, "loop").to_pylist()
                == extract_text_batch_vectorized(col).to_pylist())
        mb = 8 * len(doc) / 1e6
        t_loop = bench(col, lambda c: extract_text_batch(c, "loop"), 3)
        t_vec = bench(col, extract_text_batch_vectorized, 3)
        print(json.dumps({
            "shape": name, "doc_bytes": len(doc),
            "loop_mb_per_s": round(mb / t_loop, 1),
            "vec_mb_per_s": round(mb / t_vec, 1),
            "vec_speedup": round(t_loop / t_vec, 2),
        }))


if __name__ == "__main__":
    main()
