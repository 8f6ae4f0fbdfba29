"""State: the lake catalog, epoch commit log and schema registry.

The driver-owned state surface (SURVEY.md §7.3): :class:`LakeTable` holds
the table metadata (+ bucket count P fixed at creation), the manifest
commit log (exactly-once cursor) and snapshot reads; schema merge rules
live in :mod:`geomesa_nifi_ray.schema`.
"""

from geomesa_nifi_ray.lake import DATA_DIR, LOG_DIR, TABLE_META, LakeTable
from geomesa_nifi_ray.schema import CompatibilityMode, SchemaError, merge_schemas

__all__ = [
    "LakeTable",
    "TABLE_META",
    "LOG_DIR",
    "DATA_DIR",
    "CompatibilityMode",
    "SchemaError",
    "merge_schemas",
]
