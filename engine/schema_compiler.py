"""Schema-compilation operators: the engine analog of the reference's codegen
backend (SURVEY.md §2.3) — compile N schemas into validation plans + target
Arrow schemas, with the same allOf-merge, numeric-narrowing, and structural
dedupe semantics.

Parity targets in ``json_schema_rs/src/code_gen/rust_backend.rs``:

* C1 batch compile with per-schema error index (``:23-56``)
* C3 ``merge_all_of`` / ``merge_object_schema_into`` /
  ``merge_property_schemas`` / ``merge_numeric_bounds`` (``:720-919``):
  property union with deep per-property merge, required = first-occurrence
  ordered union, conflicting types/patterns/enums/consts -> typed errors,
  numeric bounds tighten to [max(min), min(max)] with crossing -> error
* C4 ``rust_numeric_type_for_schema`` (``:641-706``): narrow int storage from
  inclusive bounds (u8..u64 when lo>=0, else i8..i64; invalid/absent -> i64),
  f32 when both bounds fit finite f32 else f64 — mapped here to Arrow types
* C5 ``DedupeKey`` structural dedupe (``:203-305``): canonical key over the
  structural fields; canonical occurrence = first in iteration order
* C10 reverse codegen (``reverse_code_gen/mod.rs``): here the inverse maps a
  ``pyarrow.Schema`` back to a JSON Schema dict (baseline-schema inference)
"""

from __future__ import annotations

import json
from dataclasses import replace
from typing import Any, Optional

import pyarrow as pa

from engine.compile import Plan, compile_plan
from engine.errors import canonical_json
from engine.schema import AP_FORBID, Schema, UNSET, parse_schema


class CodeGenError(ValueError):
    def __init__(self, kind: str, **ctx):
        self.kind = kind
        self.ctx = ctx
        super().__init__(f"{kind}: {ctx}" if ctx else kind)


class BatchCompileError(ValueError):
    """C1: failures carry the index of the offending schema."""

    def __init__(self, failures: list[tuple[int, Exception]]):
        self.failures = failures
        super().__init__("; ".join(f"[{i}] {e}" for i, e in failures))


# ---------------------------------------------------------------------------
# allOf merge (C3)


def _is_object_like(s: Schema) -> bool:
    return s.type == "object" or bool(s.properties)


def _is_object_with_properties(s: Schema) -> bool:
    return s.type == "object" and bool(s.properties)


def _is_array_with_items(s: Schema) -> bool:
    return s.type == "array" and s.items is not None


def _is_string_enum(s: Schema) -> bool:
    return bool(s.enum) and all(isinstance(v, str) for v in s.enum)


def merge_all_of(schemas: list[Schema]) -> Schema:
    if not schemas:
        raise CodeGenError("AllOfMergeEmpty")
    for i, s in enumerate(schemas):
        if not _is_object_like(s):
            raise CodeGenError("AllOfMergeNonObjectSubschema", index=i)
    merged = Schema()
    for s in schemas:
        _merge_object_into(merged, s, "")
    merged.type = "object"
    return merged


def _merge_object_into(target: Schema, other: Schema, parent_key: str) -> None:
    for k, other_prop in sorted(other.properties.items()):
        key_for_errors = k if not parent_key else f"{parent_key}.{k}"
        if k in target.properties:
            target.properties[k] = _merge_property(
                target.properties[k], other_prop, key_for_errors)
        else:
            target.properties[k] = other_prop
    required = list(target.required or [])
    for r in other.required or []:
        if r not in required:  # union, dedupe, first-occurrence order
            required.append(r)
    target.required = required or None
    if not (target.title or "").strip():
        target.title = other.title
    if not (target.description or "").strip():
        target.description = other.description
    if target.comment is None:
        target.comment = other.comment
    if target.deprecated is None:
        target.deprecated = other.deprecated
    if target.examples is None:
        target.examples = other.examples


def _merge_property(a: Schema, b: Schema, key: str) -> Schema:
    if _is_object_with_properties(a) and _is_object_with_properties(b):
        merged = replace(a, properties=dict(a.properties))
        _merge_object_into(merged, b, key)
        return merged
    if _is_array_with_items(a) and _is_array_with_items(b):
        merged_items = _merge_property(a.items, b.items, f"{key}[]")
        return replace(a, items=merged_items)
    if a.type != b.type:
        raise CodeGenError("AllOfMergeConflictingPropertyType",
                           property_key=key)
    if a.type == "string":
        out = replace(a)
        if out.min_length is None:
            out.min_length = b.min_length
        if out.max_length is None:
            out.max_length = b.max_length
        if a.pattern is not None and b.pattern is not None:
            if a.pattern != b.pattern:
                raise CodeGenError("AllOfMergeConflictingPattern",
                                   property_key=key)
        elif out.pattern is None:
            out.pattern = b.pattern
        if out.format is None:
            out.format = b.format
        if a.enum is not None and b.enum is not None:
            if a.enum != b.enum:
                raise CodeGenError("AllOfMergeConflictingEnum",
                                   property_key=key)
        elif b.enum is not None:
            out.enum = b.enum
        if a.const is not UNSET and b.const is not UNSET:
            if a.const != b.const:
                raise CodeGenError("AllOfMergeConflictingConst",
                                   property_key=key)
        elif b.const is not UNSET:
            out.const = b.const
        return out
    if a.type in ("integer", "number"):
        out = replace(a)
        _merge_numeric_bounds(out, b, key)
        return out
    if _is_string_enum(a) and _is_string_enum(b):
        if a.enum != b.enum:
            raise CodeGenError("AllOfMergeConflictingEnum", property_key=key)
        return replace(a)
    if a.type is not None or b.type is not None:
        raise CodeGenError("AllOfMergeConflictingPropertyType",
                           property_key=key)
    return replace(a)


def _merge_numeric_bounds(target: Schema, other: Schema, key: str) -> None:
    new_min = (max(target.minimum, other.minimum)
               if target.minimum is not None and other.minimum is not None
               else (target.minimum if target.minimum is not None
                     else other.minimum))
    new_max = (min(target.maximum, other.maximum)
               if target.maximum is not None and other.maximum is not None
               else (target.maximum if target.maximum is not None
                     else other.maximum))
    if new_min is not None and new_max is not None and new_min > new_max:
        raise CodeGenError("AllOfMergeConflictingNumericBounds",
                           property_key=key, keyword="minimum/maximum")
    target.minimum = new_min
    target.maximum = new_max


def resolve_all_of(schema: Schema) -> Schema:
    """Reference ``resolve_all_of_for_codegen``: non-empty allOf merges;
    empty allOf is an error; absent passes through."""
    if schema.all_of is None:
        return schema
    if not schema.all_of:
        raise CodeGenError("AllOfMergeEmpty")
    return merge_all_of(schema.all_of)


# ---------------------------------------------------------------------------
# numeric type narrowing (C4) -> Arrow types

I64_MIN_F, I64_MAX_F = float(-(2**63)), float(2**63 - 1)
F32_MAX = 3.4028234663852886e38


def narrow_numeric_type(schema: Schema) -> pa.DataType:
    if schema.type == "integer":
        mi, ma = schema.minimum, schema.maximum
        lo = hi = None
        if (mi is not None and ma is not None and mi <= ma
                and float(mi).is_integer() and float(ma).is_integer()
                and I64_MIN_F <= mi <= I64_MAX_F
                and I64_MIN_F <= ma <= I64_MAX_F):
            lo, hi = int(mi), int(ma)
        if lo is not None:
            if lo >= 0:
                if hi <= 255:
                    return pa.uint8()
                if hi <= 65535:
                    return pa.uint16()
                if hi <= 4294967295:
                    return pa.uint32()
                return pa.uint64()
            if -128 <= lo and hi <= 127:
                return pa.int8()
            if -32768 <= lo and hi <= 32767:
                return pa.int16()
            if -(2**31) <= lo and hi <= 2**31 - 1:
                return pa.int32()
        return pa.int64()
    if schema.type == "number":
        mi, ma = schema.minimum, schema.maximum
        import math
        if (mi is not None and ma is not None and mi <= ma
                and -F32_MAX <= mi and ma <= F32_MAX
                and math.isfinite(mi) and math.isfinite(ma)):
            return pa.float32()
        return pa.float64()
    raise ValueError("narrow_numeric_type requires integer/number schema")


# ---------------------------------------------------------------------------
# target Arrow schema emission (the engine's "generate" verb)


def target_arrow_type(schema: Schema) -> pa.DataType:
    s = resolve_all_of(schema)
    t = s.type
    if t == "object" or (t is None and s.properties):
        fields = [pa.field(k, target_arrow_type(sub))
                  for k, sub in sorted(s.properties.items())]
        return pa.struct(fields)
    if t == "array":
        item = (target_arrow_type(s.items) if s.items is not None
                else pa.string())
        return pa.list_(item)
    if t in ("integer", "number"):
        return narrow_numeric_type(s)
    if t == "boolean":
        return pa.bool_()
    if t == "string" or _is_string_enum(s):
        return pa.string()
    return pa.string()  # unsupported/absent type -> opaque string (Value)


def target_arrow_schema(schema: Schema) -> pa.Schema:
    s = resolve_all_of(schema)
    st = target_arrow_type(s)
    if not pa.types.is_struct(st):
        raise CodeGenError("RootMustBeObject")
    required = set(s.required or [])
    return pa.schema([pa.field(f.name, f.type,
                               nullable=f.name not in required)
                      for f in st])


# ---------------------------------------------------------------------------
# structural dedupe (C5)


#: DedupeMode values (``code_gen/settings.rs:14-25``). The reference
#: default is Full.
DEDUPE_DISABLED = "disabled"
DEDUPE_FUNCTIONAL = "functional"
DEDUPE_FULL = "full"

#: ModelNameSource values (``code_gen/settings.rs:5-12``). The reference
#: default is title-first.
NAME_TITLE_FIRST = "title-first"
NAME_PROPERTY_KEY = "property-key"


def structural_key(schema: Schema, mode: str = DEDUPE_FULL) -> str:
    """Canonical structural fingerprint — the reference DedupeKey
    (``rust_backend.rs:210-231``). Functional mode considers only pivotal
    data (type/properties/required/title, constraints) and excludes the
    non-functional fields $id / description / $comment / examples; Full
    mode (the reference default) includes them. Numeric bounds / enum /
    const are NOT part of the reference key in either mode and are
    excluded here too."""
    if mode == DEDUPE_DISABLED:
        raise ValueError("structural_key is undefined for DedupeMode "
                         "Disabled (no deduping occurs)")

    def enc(s: Schema) -> dict:
        d: dict[str, Any] = {}
        if s.type is not None:
            d["type"] = s.type
        if s.properties:
            d["properties"] = {k: enc(v)
                               for k, v in sorted(s.properties.items())}
        ap = s.additional_properties
        if ap == AP_FORBID:
            d["additionalProperties"] = False
        elif isinstance(ap, Schema):
            d["additionalProperties"] = enc(ap)
        if s.required:
            d["required"] = list(s.required)
        if s.items is not None:
            d["items"] = enc(s.items)
        for name in ("title", "unique_items", "min_items",
                     "max_items", "min_length", "max_length", "pattern",
                     "format"):
            v = getattr(s, name)
            if v is not None:
                d[name] = v
        if s.default is not UNSET:
            d["default"] = s.default
        if mode == DEDUPE_FULL:
            # Full-only fields per rust_backend.rs:574-596: id, description,
            # comment, deprecated, examples
            for name in ("id", "description", "comment", "deprecated",
                         "examples"):
                v = getattr(s, name)
                if v is not None:
                    d[f"_{name}"] = v
        return d

    return canonical_json(enc(schema))


def dedupe_schemas(schemas: list[Schema],
                   mode: str = DEDUPE_FULL) -> tuple[list[int], list[Schema]]:
    """Structural dedupe per DedupeMode: returns (assignment per input,
    canonical list); canonical = first occurrence (deterministic).
    ``disabled`` never merges (identity assignment, reference
    ``DedupeMode::Disabled``)."""
    if mode == DEDUPE_DISABLED:
        return list(range(len(schemas))), list(schemas)
    seen: dict[str, int] = {}
    canonical: list[Schema] = []
    assign: list[int] = []
    for s in schemas:
        key = structural_key(s, mode)
        if key not in seen:
            seen[key] = len(canonical)
            canonical.append(s)
        assign.append(seen[key])
    return assign, canonical


# ---------------------------------------------------------------------------
# batch compile (C1)


def compile_batch(schema_jsons: list[str | dict], *,
                  strict: bool = False) -> list[Plan]:
    """Compile N schemas -> N plans; aggregate failures with per-schema
    index (reference ``CodeGenError::Batch``, all-or-nothing)."""
    plans: list[Optional[Plan]] = []
    failures: list[tuple[int, Exception]] = []
    for i, src in enumerate(schema_jsons):
        try:
            plans.append(compile_plan(parse_schema(src, strict=strict)))
        except Exception as e:  # noqa: BLE001 - collected, indexed
            failures.append((i, e))
            plans.append(None)
    if failures:
        raise BatchCompileError(failures)
    return plans  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# reverse: Arrow schema -> JSON Schema (C10 analog)

_INT_BOUNDS = {
    pa.int8(): (-128, 127), pa.int16(): (-32768, 32767),
    pa.int32(): (-(2**31), 2**31 - 1),
    pa.int64(): (-(2**63), 2**63 - 1),
    pa.uint8(): (0, 255), pa.uint16(): (0, 65535),
    pa.uint32(): (0, 4294967295), pa.uint64(): (0, 2**64 - 1),
}


def arrow_type_to_json_schema(t: pa.DataType) -> dict:
    if pa.types.is_struct(t):
        props = {f.name: arrow_type_to_json_schema(f.type) for f in t}
        req = [f.name for f in t if not f.nullable]
        out: dict[str, Any] = {"type": "object", "properties": props}
        if req:
            out["required"] = req
        return out
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return {"type": "array",
                "items": arrow_type_to_json_schema(t.value_type)}
    if pa.types.is_map(t):
        # map<string, V> -> object with additionalProperties: schema(V)
        # (reference BTreeMap impl, reverse_code_gen/mod.rs:143-152)
        return {"type": "object",
                "additionalProperties": arrow_type_to_json_schema(
                    t.item_type)}
    if pa.types.is_integer(t):
        out = {"type": "integer"}
        bounds = _INT_BOUNDS.get(t)
        if bounds:
            out["minimum"], out["maximum"] = bounds
        return out
    if pa.types.is_floating(t):
        # float widths carry their representable range as bounds
        # (reverse_code_gen/mod.rs:104-114); the f32 bounds round-trip
        # through narrow_numeric_type back to float32
        if t == pa.float32():
            return {"type": "number", "minimum": -F32_MAX,
                    "maximum": F32_MAX}
        return {"type": "number", "minimum": -1.7976931348623157e308,
                "maximum": 1.7976931348623157e308}
    if pa.types.is_boolean(t):
        return {"type": "boolean"}
    return {"type": "string"}


def _metadata_docs(md: Optional[dict]) -> dict:
    """Arrow metadata -> title/description fragment keys, the engine analog
    of the reference deriving ``title`` from ``#[json_schema(title=...)]``
    and ``description`` from ``///`` doc comments
    (``derive.rs:98-151``, ``:152-188``, ``:219-234``)."""
    out: dict[str, Any] = {}
    if not md:
        return out
    for key, target in ((b"title", "title"),
                        (b"description", "description")):
        v = md.get(key)
        if v is not None:
            out[target] = v.decode("utf-8")
    return out


def arrow_schema_to_json_schema(schema: pa.Schema) -> dict:
    props = {}
    for f in schema:
        frag = arrow_type_to_json_schema(f.type)
        frag.update(_metadata_docs(f.metadata))
        props[f.name] = frag
    req = [f.name for f in schema if not f.nullable]
    out: dict[str, Any] = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object", "properties": props,
    }
    if req:
        out["required"] = req
    out.update(_metadata_docs(schema.metadata))
    return out


def merge_nested_defs_into_root(schema: Schema,
                                root_defs: dict[str, Schema]) -> Schema:
    """Flatten nested ``$defs`` maps into one root-level defs dict
    (reference ``reverse_code_gen/mod.rs:160-200``): explicit stack, no
    recursion; on name collision the FIRST definition wins (``or_insert``);
    returns the schema with ``defs`` cleared. ``$ref`` values already point
    at ``#/$defs/Name`` and resolve against the root afterwards. The input
    schema object is not mutated (nodes are shallow-copied as stripped).
    """
    import dataclasses

    stack: list[tuple[Optional[str], Schema]] = [(None, schema)]
    result: Optional[Schema] = None
    while stack:
        key_opt, s = stack.pop()
        if s.defs:
            defs = s.defs
            s = dataclasses.replace(s, defs=None)
            stack.append((key_opt, s))
            for k in sorted(defs, reverse=True):
                stack.append((k, defs[k]))
        elif key_opt is not None:
            root_defs.setdefault(key_opt, s)
        else:
            result = s
    assert result is not None
    return result
