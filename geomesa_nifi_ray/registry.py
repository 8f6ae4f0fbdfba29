"""Named registries: schemas and converter plans from declarative config.

The reference resolves SimpleFeatureTypes and converters three ways —
flow-file attribute, named registry lookup, inline spec — with validation
up front (``mixins/FeatureTypeProcessor.scala:38,70-109``,
``ConvertInputProcessor.scala:75,88-95``, validators in
``…/validators/``). Here both registries are driver-side dicts populated
from python dicts (the typesafe-config analog, cf. the example converter in
``…/test/resources/application.conf:2-29``), validated at registration
time — a bad spec fails at submit, not mid-pipeline.

Schema spec format (the SFT-spec-string analog)::

    {"name": "example", "fields": [
        {"name": "id",  "type": "string"},
        {"name": "age", "type": "int32"},
        {"name": "dtg", "type": "timestamp[us]"}]}

Converter plan format::

    {"name": "example-csv", "error_mode": "skip", "fields": [
        {"name": "id",  "expr": "tostring($fid)"},
        {"name": "age", "expr": "$age::int", "required": true},
        {"name": "dtg", "expr": "date('yyyy-MM-dd', $dtg)"}]}
"""

from __future__ import annotations

import pyarrow as pa

from geomesa_nifi_ray.convert import ConvertError, FieldSpec, RecordConverter, parse_expr
from geomesa_nifi_ray.schema import SchemaError, schema_from_json


class SchemaRegistry:
    """Named pyarrow schemas (the SftConfigLoader analog)."""

    def __init__(self):
        self._schemas: dict[str, pa.Schema] = {}

    def register(self, name: str, spec: dict | pa.Schema) -> pa.Schema:
        if isinstance(spec, pa.Schema):
            schema = spec
        else:
            if "fields" not in spec:
                raise SchemaError(f"schema spec {name!r} missing 'fields'")
            schema = schema_from_json(spec["fields"])  # validates types
        self._schemas[name] = schema
        return schema

    def get(self, name: str) -> pa.Schema:
        if name not in self._schemas:
            raise SchemaError(
                f"unknown schema {name!r}; registered: {sorted(self._schemas)}"
            )
        return self._schemas[name]

    def names(self) -> list[str]:
        return sorted(self._schemas)


class ConverterRegistry:
    """Named converter plans; expressions parse-validated at registration
    (the ConverterValidator analog)."""

    def __init__(self):
        self._plans: dict[str, dict] = {}

    def register(self, spec: dict) -> None:
        name = spec.get("name")
        if not name:
            raise ConvertError("converter spec missing 'name'")
        if spec.get("error_mode", "skip") not in ("skip", "raise"):
            raise ConvertError(f"bad error_mode in converter {name!r}")
        fields = spec.get("fields")
        if not fields:
            raise ConvertError(f"converter {name!r} has no fields")
        for f in fields:
            parse_expr(f["expr"])  # raises on bad expressions
        self._plans[name] = spec

    def build(self, name: str, attributes: dict | None = None) -> RecordConverter:
        if name not in self._plans:
            raise ConvertError(
                f"unknown converter {name!r}; registered: {sorted(self._plans)}"
            )
        spec = self._plans[name]
        fields = [
            FieldSpec(
                f["name"], f["expr"], type=f.get("type"), required=bool(f.get("required"))
            )
            for f in spec["fields"]
        ]
        return RecordConverter(
            fields, attributes=attributes, error_mode=spec.get("error_mode", "skip")
        )

    def names(self) -> list[str]:
        return sorted(self._plans)


def validate_gzip_level(level: int) -> int:
    """GzipLevelValidator analog (1-9)."""
    if not isinstance(level, int) or not 1 <= level <= 9:
        raise ValueError(f"gzip level must be 1-9, got {level!r}")
    return level


def validate_write_mode(mode: str) -> str:
    """WriteModeValidator analog (append | modify ≙ upsert | update)."""
    if mode not in ("upsert", "update"):
        raise ValueError(f"write mode must be 'upsert' or 'update', got {mode!r}")
    return mode
