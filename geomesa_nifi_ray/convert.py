"""Record-converter chains: a compiled field-transform expression language.

Re-implements the *semantics* of the reference's converter framework
(GeoMesa convert2 DSL as configured in
``geomesa-datastore-bundle/…/test/resources/application.conf:12-29`` and the
GDELT converter in ``…/test/resources/docker/reference.conf``; invoked via
``mixins/ConvertInputProcessor.scala:81-129``) as a tiny expression compiler
whose output is a vectorized Arrow kernel:

    $col                 column reference
    ${name}              attribute / per-epoch constant (flow-file attr analog)
    expr::type           cast  (int, long, float, double, string, bool)
    date('yyyy-MM-dd', e)  Java-pattern timestamp parse -> timestamp[us]
    concat(a, b, …)      string concatenation
    lower/upper/trim/length/md5/tostring(e)
    point(x, y[, decimals]) WKT POINT constructor (geometry.wkt_point)
    replace(e, 'a', 'b') substring replace
    coalesce(a, b, …)
    lineno()             global row number within the stream
    'literal'  /  123  /  1.5

A ``ConverterPlan`` is an ordered list of ``FieldSpec(name, type, expr,
required)``. ``RecordConverter`` compiles the plan ONCE (in ``__init__`` —
the converter-pool analog, ``ConvertInputProcessor.scala:46-72``) and is
used as a callable class in ``map_batches(RecordConverter, concurrency=N)``.

Error modes (``ErrorMode`` at ``ConvertInputProcessor.scala:180``):
- ``raise``: any conversion failure aborts the batch;
- ``skip``: failed rows (a *required* field null after conversion) are
  dropped and counted — the bad-record skip loop of
  ``PutGeoMesaRecord.scala:93-103``.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class ConvertError(ValueError):
    pass


# ---------------------------------------------------------------- parsing --

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<attr>\$\{[A-Za-z_][\w.]*\})
      | (?P<col>\$[A-Za-z_0-9][\w]*)
      | (?P<str>'(?:[^'\\]|\\.)*')
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<ident>[A-Za-z_][\w]*)
      | (?P<cast>::)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
    )""",
    re.X,
)


def _tokenize(src: str):
    pos, out = 0, []
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ConvertError(f"cannot tokenize {src[pos:]!r} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


@dataclass
class Node:
    kind: str                      # col | attr | lit | call | cast
    value: object = None
    args: list = field(default_factory=list)


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self._term()
        while self.peek()[0] == "cast":
            self.next()
            kind, val = self.next()
            if kind != "ident":
                raise ConvertError("expected type after ::")
            node = Node("cast", val.lower(), [node])
        if self.i != len(self.toks):
            raise ConvertError(f"trailing tokens at {self.toks[self.i:]}")
        return node

    def _expr(self) -> Node:
        node = self._term()
        while self.peek()[0] == "cast":
            self.next()
            kind, val = self.next()
            if kind != "ident":
                raise ConvertError("expected type after ::")
            node = Node("cast", val.lower(), [node])
        return node

    def _term(self) -> Node:
        kind, val = self.next()
        if kind == "col":
            return Node("col", val[1:])
        if kind == "attr":
            return Node("attr", val[2:-1])
        if kind == "str":
            return Node("lit", val[1:-1].replace("\\'", "'"))
        if kind == "num":
            return Node("lit", float(val) if "." in val else int(val))
        if kind == "ident":
            if self.peek()[0] != "lparen":
                raise ConvertError(f"bare identifier {val!r}")
            self.next()
            args = []
            if self.peek()[0] != "rparen":
                args.append(self._expr())
                while self.peek()[0] == "comma":
                    self.next()
                    args.append(self._expr())
            if self.next()[0] != "rparen":
                raise ConvertError("expected )")
            return Node("call", val.lower(), args)
        raise ConvertError(f"unexpected token {kind} {val!r}")


def parse_expr(src: str) -> Node:
    return _Parser(_tokenize(src)).parse()


# ------------------------------------------------------------ compilation --

_ARROW_TYPES = {
    "int": pa.int32(), "int32": pa.int32(),
    "long": pa.int64(), "int64": pa.int64(),
    "float": pa.float32(), "double": pa.float64(), "float64": pa.float64(),
    "string": pa.string(), "bool": pa.bool_(), "boolean": pa.bool_(),
    "timestamp": pa.timestamp("us"),
}

_JAVA_FMT = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
    ("mm", "%M"), ("ss", "%S"), ("SSS", "%f"), ("'T'", "T"), ("'Z'", "Z"),
]


def java_to_strptime(fmt: str) -> str:
    for j, p in _JAVA_FMT:
        fmt = fmt.replace(j, p)
    return fmt


def _as_array(v, n: int) -> pa.Array | pa.ChunkedArray:
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    return pa.array([v] * n)


def _try_cast(arr, typ: pa.DataType, error_mode: str):
    """Cast with per-row failure -> null in skip mode (DuckDB try_cast analog)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    try:
        return pc.cast(arr, typ)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        if error_mode == "raise":
            raise
    s = arr.to_pandas()
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        vals = pd.to_numeric(s, errors="coerce")
        if pa.types.is_integer(typ):
            return pa.array(vals.astype("Int64"), type=typ)
        return pa.array(vals, type=typ)
    if pa.types.is_timestamp(typ):
        return pa.array(pd.to_datetime(s, errors="coerce", utc=False), type=typ)
    if pa.types.is_string(typ):
        return pa.array(s.astype(str).where(s.notna(), None), type=typ)
    raise ConvertError(f"unsupported try_cast to {typ}")


def _compile(node: Node, error_mode: str):
    """Node -> fn(batch: pa.Table, ctx: dict) -> Array|scalar."""
    if node.kind == "col":
        name = node.value

        def col_fn(batch, ctx):
            if name not in batch.column_names:
                raise ConvertError(f"column ${name} not in batch (have {batch.column_names})")
            return batch[name]

        return col_fn
    if node.kind == "attr":
        name = node.value
        return lambda batch, ctx: ctx.get("attributes", {}).get(name)
    if node.kind == "lit":
        v = node.value
        return lambda batch, ctx: v
    if node.kind == "cast":
        typ = _ARROW_TYPES.get(node.value)
        if typ is None:
            raise ConvertError(f"unknown cast type {node.value!r}")
        inner = _compile(node.args[0], error_mode)
        return lambda batch, ctx: _try_cast(
            _as_array(inner(batch, ctx), batch.num_rows), typ, error_mode
        )
    if node.kind == "call":
        return _compile_call(node, error_mode)
    raise ConvertError(f"unknown node kind {node.kind}")


def _compile_call(node: Node, error_mode: str):
    name = node.value
    args = [_compile(a, error_mode) for a in node.args]

    if name == "lineno":
        def lineno_fn(batch, ctx):
            base = int(ctx.get("line_base", 0))
            return pa.array(np.arange(base, base + batch.num_rows, dtype=np.int64))
        return lineno_fn

    if name == "concat":
        def concat_fn(batch, ctx):
            n = batch.num_rows
            parts = [
                pc.cast(_as_array(a(batch, ctx), n), pa.string())
                for a in args
            ]
            return pc.binary_join_element_wise(*parts, "")
        return concat_fn

    if name == "date":
        if len(args) != 2 or node.args[0].kind != "lit":
            raise ConvertError("date(fmt, expr) needs a literal format")
        fmt = java_to_strptime(str(node.args[0].value))
        inner = args[1]

        def date_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # reader may have pre-parsed the column (csv type inference):
            # temporal input just casts, string input parses with the format
            if pa.types.is_temporal(arr.type):
                return pc.cast(arr, pa.timestamp("us"))
            try:
                return pc.strptime(arr, format=fmt, unit="us")
            except pa.ArrowInvalid:
                if error_mode == "raise":
                    raise
                s = pd.to_datetime(arr.to_pandas(), format=fmt, errors="coerce")
                return pa.array(s, type=pa.timestamp("us"))
        return date_fn

    if name == "point":
        # point(x, y[, decimals]) -> WKT POINT string; the convert2 DSL's
        # point() geometry constructor feeding the WKT field converter
        # (SimpleFeatureRecordConverter.scala:427-433, encoding selection
        # :253-257). Vectorized via geometry.wkt_point.
        if len(args) not in (2, 3):
            raise ConvertError("point(x, y[, decimals]) needs 2 or 3 args")
        decimals = 6
        if len(args) == 3:
            if node.args[2].kind != "lit":
                raise ConvertError("point() decimals must be a literal int")
            decimals = int(node.args[2].value)
        fx, fy = args[0], args[1]

        def point_fn(batch, ctx):
            from geomesa_nifi_ray.geometry import wkt_point

            n = batch.num_rows
            return wkt_point(
                pc.cast(_as_array(fx(batch, ctx), n), pa.float64()),
                pc.cast(_as_array(fy(batch, ctx), n), pa.float64()),
                decimals=decimals,
            )
        return point_fn

    unary = {
        "lower": lambda a: pc.utf8_lower(a),
        "upper": lambda a: pc.utf8_upper(a),
        "trim": lambda a: pc.utf8_trim_whitespace(a),
        "length": lambda a: pc.cast(pc.utf8_length(a), pa.int64()),
        "tostring": lambda a: pc.cast(a, pa.string()),
    }
    if name in unary:
        inner = args[0]
        op = unary[name]
        return lambda batch, ctx: op(
            pc.cast(_as_array(inner(batch, ctx), batch.num_rows), pa.string())
            if name != "tostring"
            else _as_array(inner(batch, ctx), batch.num_rows)
        )

    if name == "md5":
        inner = args[0]

        def md5_fn(batch, ctx):
            arr = pc.cast(_as_array(inner(batch, ctx), batch.num_rows), pa.string())
            return pa.array(
                [None if v is None else hashlib.md5(v.encode()).hexdigest()
                 for v in arr.to_pylist()],
                type=pa.string(),
            )
        return md5_fn

    if name == "json":
        # nested list/map/struct cell -> JSON string (the gson serialization
        # of SimpleFeatureRecordConverter.scala:503-514)
        import json as _json

        inner = args[0]

        def json_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return pa.array(
                [None if v is None else _json.dumps(v, default=str, sort_keys=True)
                 for v in arr.to_pylist()],
                type=pa.string(),
            )
        return json_fn

    if name == "uuid":
        # UUID<->string converter (SimpleFeatureRecordConverter.scala:421-425):
        # canonicalize to lowercase hyphenated form; invalid -> null (skip)
        # or ConvertError (raise)
        import uuid as _uuid

        inner = args[0]

        def uuid_fn(batch, ctx):
            arr = pc.cast(_as_array(inner(batch, ctx), batch.num_rows), pa.string())
            out = []
            for v in arr.to_pylist():
                if v is None:
                    out.append(None)
                    continue
                try:
                    out.append(str(_uuid.UUID(v)))
                except ValueError:
                    if error_mode == "raise":
                        raise ConvertError(f"invalid UUID {v!r}")
                    out.append(None)
            return pa.array(out, type=pa.string())
        return uuid_fn

    # ---- nested (List/Map/nested-record) two-way converters — the analog
    # of SimpleFeatureRecordConverter.scala:467-528 List/Map/Record support.
    if name == "split":
        if node.args[1].kind != "lit":
            raise ConvertError("split(expr, 'sep') needs a literal separator")
        sep = str(node.args[1].value)
        inner = args[0]
        return lambda batch, ctx: pc.split_pattern(
            pc.cast(_as_array(inner(batch, ctx), batch.num_rows), pa.string()), sep
        )

    if name == "join":
        if node.args[1].kind != "lit":
            raise ConvertError("join(expr, 'sep') needs a literal separator")
        sep = str(node.args[1].value)
        inner = args[0]

        def join_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return pc.binary_join(pc.cast(arr, pa.list_(pa.string())), sep)
        return join_fn

    if name == "list_len":
        inner = args[0]

        def list_len_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return pc.cast(pc.list_value_length(arr), pa.int64())
        return list_len_fn

    if name == "list_get":
        if node.args[1].kind != "lit":
            raise ConvertError("list_get(expr, i) needs a literal index")
        idx = int(node.args[1].value)
        inner = args[0]

        def list_get_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            # null-safe element access (pc.list_element raises on short lists)
            lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
            vals = arr.to_pylist()
            return pa.array(
                [v[idx] if v is not None and lens[i] is not None and lens[i] > idx else None
                 for i, v in enumerate(vals)]
            )
        return list_get_fn

    if name == "map_get":
        if node.args[1].kind != "lit":
            raise ConvertError("map_get(expr, 'key') needs a literal key")
        mkey = node.args[1].value
        inner = args[0]

        def map_get_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            hit = pc.map_lookup(arr, query_key=mkey, occurrence="first")
            return hit
        return map_get_fn

    if name == "struct_get":
        if node.args[1].kind != "lit":
            raise ConvertError("struct_get(expr, 'field') needs a literal name")
        fname = str(node.args[1].value)
        inner = args[0]

        def struct_get_fn(batch, ctx):
            arr = _as_array(inner(batch, ctx), batch.num_rows)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return pc.struct_field(arr, fname)
        return struct_get_fn

    if name == "replace":
        if node.args[1].kind != "lit" or node.args[2].kind != "lit":
            raise ConvertError("replace(expr, 'from', 'to') needs literals")
        frm, to = str(node.args[1].value), str(node.args[2].value)
        inner = args[0]
        return lambda batch, ctx: pc.replace_substring(
            pc.cast(_as_array(inner(batch, ctx), batch.num_rows), pa.string()), frm, to
        )

    if name == "coalesce":
        def coalesce_fn(batch, ctx):
            n = batch.num_rows
            arrs = [_as_array(a(batch, ctx), n) for a in args]
            arrs = [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrs]
            return pc.coalesce(*arrs)
        return coalesce_fn

    raise ConvertError(f"unknown function {name!r}")


# ------------------------------------------------------------------- plans --

@dataclass(frozen=True)
class FieldSpec:
    name: str
    expr: str
    type: str | None = None        # optional target arrow type name
    required: bool = False         # null after conversion -> row dead-lettered


@dataclass
class ConvertResult:
    table: pa.Table
    failed: int


class RecordConverter:
    """Compiled converter plan; callable-class form for actor-pool stages.

    Plan compile happens once per instance (actor ``__init__``) — the
    Caffeine/commons-pool converter-pool analog. Thread/process safe: no
    mutable state besides the monotone lineno counter (per-actor)."""

    def __init__(
        self,
        fields: list[FieldSpec],
        attributes: dict | None = None,
        error_mode: str = "skip",
    ):
        if error_mode not in ("skip", "raise"):
            raise ConvertError(f"unknown error mode {error_mode!r}")
        self.fields = list(fields)
        self.error_mode = error_mode
        self.attributes = dict(attributes or {})
        self._compiled = [
            (f, _compile(parse_expr(f.expr), error_mode)) for f in self.fields
        ]
        self._line_base = 0
        self.failed_total = 0

    def convert(self, batch: pa.Table) -> ConvertResult:
        n = batch.num_rows
        ctx = {"attributes": self.attributes, "line_base": self._line_base}
        self._line_base += n
        cols, names = [], []
        for f, fn in self._compiled:
            arr = _as_array(fn(batch, ctx), n)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if f.type is not None:
                arr = _try_cast(arr, _ARROW_TYPES[f.type], self.error_mode)
            cols.append(arr)
            names.append(f.name)
        out = pa.table(dict(zip(names, cols)))
        mask = None
        for f in self.fields:
            if f.required:
                valid = pc.is_valid(out[f.name])
                mask = valid if mask is None else pc.and_(mask, valid)
        failed = 0
        if mask is not None:
            keep = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            failed = n - keep
            if failed and self.error_mode == "raise":
                raise ConvertError(f"{failed} rows failed required-field conversion")
            if failed:
                out = out.filter(mask)
        self.failed_total += failed
        return ConvertResult(out, failed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.convert(batch).table
