"""Driver contract for the Ray-Data-native CDC/incremental-ingest engine.

``entry()`` runs the flagship exactly-once CDC replay at sf0.001;
``queries()`` exposes every implemented pipeline/operator (SURVEY.md §2 +
training-data ops); ``oracle_sql()`` gives DuckDB-equivalent SQL for each
SQL-expressible query (CDC oracles read the deterministically synthesized
binlog parquet by absolute path; the rest use the pre-registered views).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geomesa_nifi_ray.pipelines.queries import (  # noqa: E402
    QUERIES,
    get_binlog,
    oracle_sql_for,
    run_cdc_replay,
)

_SF001 = "/root/testdata/sf0.001"
_SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship pipeline: full CDC replay of the sf0.001 binlog (convert ->
    LWW dedup -> bucketed upsert -> manifest commit), returning the final
    lake snapshot."""
    eng = run_cdc_replay(_SF001)
    return eng.table.snapshot_table()


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # the driver's correctness pass runs at sf0.01; generate that tier's
    # binlog now (idempotent) so the SQL's read_parquet paths resolve even
    # if the oracle runs before the Ray pipeline
    get_binlog(_SF01)
    return oracle_sql_for(_SF01)
