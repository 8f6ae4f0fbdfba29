"""Arrow schema reconciliation with Exact | Existing | Update modes.

Re-implements the reference's three-valued ``CompatibilityMode`` schema
check (``geomesa-datastore-bundle/…/processor/package.scala:92-95``,
``mixins/DataStoreIngestProcessor.scala:225-301``) over ``pyarrow.Schema``:

- table absent            -> create (caller's responsibility; see LakeTable)
- input adds columns      -> Exact: error; Existing: warn & project input
                             down to the stored schema; Update: widen the
                             stored schema (new nullable columns appended)
- input missing columns   -> null-filled on projection (the per-row Avro
                             adapter behavior, ``AvroToPutGeoMesa.scala:201-222``)
- column removed (Update asked to drop a stored column) -> hard error
  (``DataStoreIngestProcessor.scala:294-296``) — we treat Update as purely
  additive: missing input columns never remove stored ones
- column type changed     -> hard error with per-column message (:298-301),
  unless the change is a safe widening (int32->int64, float32->float64,
  int->float, string->large_string …), which is applied by cast on
  projection (the "assignable" passthrough of the Avro adapter).

All functions are pure; the engine runs the check once per epoch on the
driver (the reference memoizes per-SFT with an hourly refresh,
``DataStoreIngestProcessor.scala:166-183`` — epoch scoping replaces the TTL)
and applies the resulting projection as a vectorized ``map_batches`` stage.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc


class CompatibilityMode(enum.Enum):
    EXACT = "exact"
    EXISTING = "existing"
    UPDATE = "update"


class SchemaError(ValueError):
    """Raised when an incoming schema cannot be reconciled with the stored
    schema under the configured compatibility mode."""


def _is_assignable(src: pa.DataType, dst: pa.DataType) -> bool:
    if src.equals(dst):
        return True
    if pa.types.is_null(src):
        # an all-null column (e.g. payload-less delete events) carries no
        # type information; projection null-fills it into any stored type
        return True
    # integer widening is always exact; int->float only when every value of
    # the source type fits the float's mantissa EXACTLY (float32: 24 bits,
    # float64: 53) — "assignable" is a promise that the projection's safe
    # cast cannot fail, and pyarrow raises ArrowInvalid for e.g.
    # int64 16777217 -> float32, which would pass a rank check at the gate
    # and then crash mid-epoch in the convert stage
    int_rank = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
    if src in int_rank and dst in int_rank:
        return int_rank[src] <= int_rank[dst]
    if src in int_rank and dst == pa.float32():
        return int_rank[src] <= 1          # int8/int16 fit 24 mantissa bits
    if src in int_rank and dst == pa.float64():
        return int_rank[src] <= 2          # up to int32 fits 53 bits
    if src == pa.float32() and dst == pa.float64():
        return True
    string_like = {pa.string(), pa.large_string()}
    if src in string_like and dst in string_like:
        return True
    binary_like = {pa.binary(), pa.large_binary()}
    if src in binary_like and dst in binary_like:
        return True
    if pa.types.is_timestamp(src) and pa.types.is_timestamp(dst):
        return True
    return False


# --- Choice (union) type fallback -----------------------------------------
#
# The reference's converter handles NiFi CHOICE fields one-way via toString
# (``SimpleFeatureRecordConverter.scala:516-528``); SURVEY §1.2 maps this to
# "cast to a common type at ingest". An Arrow union column is resolved to:
# all-numeric children -> the widest numeric type; all string-like ->
# string; anything else -> string via each child's cast (the toString
# analog). The stored schema never contains a union.

_NUMERIC_RANK_ORDER = (pa.int8(), pa.int16(), pa.int32(), pa.int64(),
                       pa.float32(), pa.float64())


def resolve_union_type(t: pa.DataType) -> pa.DataType:
    """Common concrete type for a union's children (see module note)."""
    if not pa.types.is_union(t):
        return t
    child_types = [t.field(i).type for i in range(t.num_fields)]
    concrete = [c for c in child_types if not pa.types.is_null(c)]
    if not concrete:
        return pa.null()
    if all(c in _NUMERIC_RANK_ORDER for c in concrete):
        return max(concrete, key=_NUMERIC_RANK_ORDER.index)
    if all(pa.types.is_string(c) or pa.types.is_large_string(c) for c in concrete):
        return pa.string()
    return pa.string()  # toString fallback, matching the reference


def resolve_union_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Cast a union array to its resolved common type, vectorized: each
    child casts once, then one global ``take`` interleaves rows by type id
    (dense offsets / sparse row index)."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if not pa.types.is_union(t):
        return arr
    target = resolve_union_type(t)
    n = len(arr)
    if n == 0 or pa.types.is_null(target):
        return pa.nulls(n, type=target if not pa.types.is_null(target) else pa.null())
    type_codes = np.frombuffer(arr.buffers()[1], dtype=np.int8, count=n + arr.offset)[
        arr.offset:]
    cast_children = [pc.cast(arr.field(i), target) for i in range(t.num_fields)]
    starts = np.cumsum([0] + [len(c) for c in cast_children])
    # map type code -> child index (codes need not be 0..k-1)
    code_to_child = {t.type_codes[i]: i for i in range(t.num_fields)}
    child_idx = np.vectorize(code_to_child.get, otypes=[np.int64])(type_codes)
    if t.mode == "dense":
        offsets = np.frombuffer(
            arr.buffers()[2], dtype=np.int32, count=n + arr.offset
        )[arr.offset:].astype(np.int64)
    else:  # sparse: children are row-aligned
        offsets = np.arange(n, dtype=np.int64)
    take_idx = starts[child_idx] + offsets
    return pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                             else c for c in cast_children]).take(pa.array(take_idx))


def resolve_union_columns(table: pa.Table) -> tuple[pa.Table, list[str]]:
    """Replace every union column with its common-type cast; returns the
    new table and one warning string per coerced column."""
    warnings: list[str] = []
    for i, f in enumerate(table.schema):
        if pa.types.is_union(f.type):
            resolved = resolve_union_array(table[f.name])
            table = table.set_column(
                i, pa.field(f.name, resolved.type, nullable=True), resolved
            )
            warnings.append(
                f"choice/union column {f.name!r} coerced to {resolved.type} "
                "(one-way, SimpleFeatureRecordConverter.scala:516-528 analog)"
            )
    return table, warnings


@dataclass
class SchemaMergeResult:
    schema: pa.Schema                      # stored schema after the merge
    evolved: bool = False                  # True iff stored schema widened
    added_columns: list[str] = field(default_factory=list)
    projected_away: list[str] = field(default_factory=list)  # input cols dropped
    null_filled: list[str] = field(default_factory=list)     # stored cols absent from input
    warnings: list[str] = field(default_factory=list)


def merge_schemas(
    stored: pa.Schema,
    incoming: pa.Schema,
    mode: CompatibilityMode,
    ignore: tuple[str, ...] = (),
) -> SchemaMergeResult:
    """Reconcile ``incoming`` with ``stored`` under ``mode``.

    ``ignore`` lists engine-internal columns (e.g. computed ``text``,
    ``content_hash``, ``bucket``) excluded from the comparison.
    """
    stored_fields = {f.name: f for f in stored if f.name not in ignore}
    union_warnings: list[str] = []
    incoming_norm = []
    for f in incoming:
        if pa.types.is_union(f.type):
            rt = resolve_union_type(f.type)
            union_warnings.append(
                f"choice/union input column {f.name!r} resolves to {rt} at ingest"
            )
            f = pa.field(f.name, rt, nullable=True)
        incoming_norm.append(f)
    incoming = pa.schema(incoming_norm)
    incoming_fields = {f.name: f for f in incoming if f.name not in ignore}

    extra = [n for n in incoming_fields if n not in stored_fields]
    missing = [n for n in stored_fields if n not in incoming_fields]
    retyped: list[str] = []
    for name, inf in incoming_fields.items():
        sf = stored_fields.get(name)
        if sf is None:
            continue
        if not _is_assignable(inf.type, sf.type):
            if mode is CompatibilityMode.UPDATE and _is_assignable(sf.type, inf.type):
                # widening type evolution requested by the input
                retyped.append(name)
            else:
                raise SchemaError(
                    f"column '{name}' type change {inf.type} -> {sf.type} is not supported"
                )

    result = SchemaMergeResult(schema=stored)
    result.warnings.extend(union_warnings)

    if mode is CompatibilityMode.EXACT:
        if extra or missing or retyped:
            raise SchemaError(
                f"schema mismatch in Exact mode: extra={extra} missing={missing} retyped={retyped}"
            )
        return result

    if mode is CompatibilityMode.EXISTING:
        if extra:
            result.projected_away = extra
            result.warnings.append(f"projecting away input columns not in stored schema: {extra}")
        if missing:
            result.null_filled = missing
            result.warnings.append(f"null-filling stored columns absent from input: {missing}")
        return result

    # UPDATE: widen stored schema — append new nullable columns, apply
    # widening type changes, never remove. Every new/retyped column type
    # must survive the _table.json round-trip; reject BEFORE the caller
    # persists the widened schema (a post-write failure would leave the
    # table metadata permanently unloadable).
    for name in extra + retyped:
        try:
            type_to_json(incoming_fields[name].type)
        except SchemaError as err:
            raise SchemaError(
                f"cannot evolve schema: column '{name}' has unsupported type "
                f"{incoming_fields[name].type} ({err})"
            ) from err
    new_fields = []
    for f in stored:
        if f.name in retyped:
            new_fields.append(pa.field(f.name, incoming_fields[f.name].type, nullable=True))
            result.evolved = True
        else:
            new_fields.append(f)
    for name in extra:
        new_fields.append(pa.field(name, incoming_fields[name].type, nullable=True))
        result.evolved = True
        result.added_columns.append(name)
    if missing:
        result.null_filled = missing
    result.schema = pa.schema(new_fields, metadata=stored.metadata)
    return result


def project_to_schema(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Project an Arrow batch to ``target``: reorder by name, cast
    assignable types, null-fill missing columns, drop extras.

    The vectorized analog of the reference's per-row schema adapter
    (``AvroToPutGeoMesa.scala:201-222``).
    """
    n = table.num_rows
    cols = []
    for f in target:
        if f.name in table.column_names:
            col = table[f.name]
            if pa.types.is_union(col.type):
                col = resolve_union_array(col)   # choice -> common type
            if not col.type.equals(f.type):
                col = pc.cast(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, type=f.type))
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=pa.schema([pa.field(f.name, f.type, nullable=True) for f in target]),
    )


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable fingerprint of a schema (name:type pairs) for manifests."""
    import hashlib

    payload = ";".join(f"{f.name}:{f.type}" for f in schema)
    return hashlib.md5(payload.encode("utf-8")).hexdigest()[:16]


def schema_to_json(schema: pa.Schema) -> list[dict]:
    return [{"name": f.name, "type": type_to_json(f.type)} for f in schema]


# scalar types by their str() name — the readable JSON form; nested and
# parameterized types serialize as structured dicts (see type_to_json)
_TYPE_PARSERS = {
    "string": pa.string(), "large_string": pa.large_string(),
    "binary": pa.binary(), "large_binary": pa.large_binary(),
    "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(),
    "uint8": pa.uint8(), "uint16": pa.uint16(),
    "uint32": pa.uint32(), "uint64": pa.uint64(),
    "float": pa.float32(), "float32": pa.float32(),
    "double": pa.float64(), "float64": pa.float64(),
    "bool": pa.bool_(), "null": pa.null(),
    "date32[day]": pa.date32(), "date32": pa.date32(),
    "date64[ms]": pa.date64(), "date64": pa.date64(),
    "time32[s]": pa.time32("s"), "time32[ms]": pa.time32("ms"),
    "time64[us]": pa.time64("us"), "time64[ns]": pa.time64("ns"),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ns]": pa.timestamp("ns"),
    "timestamp[us, tz=UTC]": pa.timestamp("us", tz="UTC"),
}


def type_to_json(t: pa.DataType) -> str | dict:
    """Lossless JSON form of a lake column type. Scalars serialize to their
    readable ``str(type)`` name; timestamps with zones and nested types
    (list / large_list / map / struct — ``SimpleFeatureRecordConverter.scala:
    467-528``'s List/Map/nested-record analog) serialize structurally.
    Raises :class:`SchemaError` for anything the lake cannot round-trip, so
    evolution is rejected *before* ``_table.json`` is written."""
    s = str(t)
    if s in _TYPE_PARSERS and _TYPE_PARSERS[s].equals(t):
        return s
    if pa.types.is_timestamp(t):
        return {"kind": "timestamp", "unit": t.unit, "tz": t.tz}
    if pa.types.is_list(t):
        return {"kind": "list", "item": type_to_json(t.value_type)}
    if pa.types.is_large_list(t):
        return {"kind": "large_list", "item": type_to_json(t.value_type)}
    if pa.types.is_map(t):
        return {"kind": "map", "key": type_to_json(t.key_type),
                "item": type_to_json(t.item_type)}
    if pa.types.is_struct(t):
        return {"kind": "struct",
                "fields": [{"name": f.name, "type": type_to_json(f.type)} for f in t]}
    if pa.types.is_decimal(t):
        return {"kind": "decimal128", "precision": t.precision, "scale": t.scale}
    raise SchemaError(f"unsupported lake column type {t}")


def type_from_json(v: str | dict) -> pa.DataType:
    if isinstance(v, str):
        t = _TYPE_PARSERS.get(v)
        if t is None:
            raise SchemaError(f"cannot parse stored type {v!r}")
        return t
    kind = v["kind"]
    if kind == "timestamp":
        return pa.timestamp(v["unit"], tz=v.get("tz"))
    if kind == "list":
        return pa.list_(type_from_json(v["item"]))
    if kind == "large_list":
        return pa.large_list(type_from_json(v["item"]))
    if kind == "map":
        return pa.map_(type_from_json(v["key"]), type_from_json(v["item"]))
    if kind == "struct":
        return pa.struct(
            [pa.field(f["name"], type_from_json(f["type"]), nullable=True)
             for f in v["fields"]]
        )
    if kind == "decimal128":
        return pa.decimal128(v["precision"], v["scale"])
    raise SchemaError(f"cannot parse stored type {v!r}")


def schema_from_json(fields: list[dict]) -> pa.Schema:
    return pa.schema(
        [pa.field(f["name"], type_from_json(f["type"]), nullable=True) for f in fields]
    )
