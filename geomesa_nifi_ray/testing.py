"""Rehearsal filesystems: simulate object-store semantics on local disk.

``object_store_sim_fs()`` returns a :class:`~geomesa_nifi_ray.lake.LakeFS`
whose backend (a) fails hard on any rename — S3 has none, a "move" is
copy+delete, and the lake's exactly-once protocol must never rely on one
— and (b) pays a per-open latency, approximating object-store round
trips. Used by the test suite to prove the commit protocol holds without
rename atomicity (single-PUT atomicity + manifest-written-last is the
linearization point, ``lake.LakeFS`` docstring); importable from Ray
workers, unlike classes defined inside test modules."""

from __future__ import annotations

import time

from fsspec.implementations.local import LocalFileSystem as _FsspecLocal


class SlowNoRenameFS(_FsspecLocal):
    """fsspec backend: local disk, no rename, per-open latency."""

    latency = 0.002

    def mv(self, *args, **kwargs):  # pragma: no cover - raising IS the contract
        raise AssertionError("rename attempted on a no-rename store")

    mv_file = mv

    def _open(self, *args, **kwargs):
        time.sleep(self.latency)
        return super()._open(*args, **kwargs)


def object_store_sim_fs():
    """LakeFS over the no-rename, latency-injected backend."""
    import pyarrow.fs as pafs

    from geomesa_nifi_ray.lake import LakeFS

    return LakeFS(pafs.PyFileSystem(pafs.FSSpecHandler(SlowNoRenameFS())),
                  rename_capable=False)
