"""Schema model: a struct of ~30 optional keywords + lenient/strict parser.

Parity target: reference ``json_schema_rs/src/json_schema/json_schema.rs``:

* struct-of-optional-keys model, not an enum of subtypes (``:277-403``);
* ``properties`` iterated in lexicographic key order (BTreeMap, ``:304-306``);
* ``type`` array truncated to its first element at parse time (``:96-114``);
* ``additionalProperties`` tri-state Allow | Forbid | Schema (``:52-94``);
* lenient parse ignores unknown keys; strict mode
  (``JsonSchemaSettings::disallow_unknown_fields``) rejects them
  (``:137-275``, settings ``settings.rs:12-21``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional, Union


class SchemaParseError(ValueError):
    """Schema JSON did not conform to the schema model."""


class _Unset:
    """Identity-compared sentinel; singleton even across pickling (plans are
    shipped to Ray workers, so ``__new__`` must always return the one
    instance)."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_Unset, ())

    def __repr__(self) -> str:  # pragma: no cover
        return "UNSET"


#: Sentinel distinguishing "keyword absent" from "keyword present with value
#: null" (needed for ``const`` / ``default`` whose value may legally be null).
UNSET: Any = _Unset()

#: additionalProperties tri-state markers (Schema instance = the third state).
AP_ALLOW = "allow"
AP_FORBID = "forbid"

KNOWN_KEYS = {
    "$schema", "$id", "$ref", "type", "$defs", "definitions", "properties",
    "additionalProperties", "required", "title", "description", "$comment",
    "enum", "const", "items", "uniqueItems", "minItems", "maxItems",
    "minimum", "maximum", "minLength", "maxLength", "pattern", "format",
    "default", "deprecated", "examples", "allOf", "anyOf", "oneOf",
}


@dataclass
class Schema:
    schema_uri: Optional[str] = None
    id: Optional[str] = None
    ref: Optional[str] = None
    type: Optional[str] = None
    defs: Optional[dict[str, "Schema"]] = None
    definitions: Optional[dict[str, "Schema"]] = None
    properties: dict[str, "Schema"] = field(default_factory=dict)
    additional_properties: Optional[Union[str, "Schema"]] = None  # AP_ALLOW/AP_FORBID/Schema
    required: Optional[list[str]] = None
    title: Optional[str] = None
    description: Optional[str] = None
    comment: Optional[str] = None
    enum: Optional[list[Any]] = None
    const: Any = UNSET
    items: Optional["Schema"] = None
    unique_items: Optional[bool] = None
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[str] = None
    format: Optional[str] = None
    default: Any = UNSET
    deprecated: Optional[bool] = None
    examples: Optional[list[Any]] = None
    all_of: Optional[list["Schema"]] = None
    any_of: Optional[list["Schema"]] = None
    one_of: Optional[list["Schema"]] = None
    #: registry-registered custom keywords, resolved AT PARSE TIME to
    #: ``{keyword: (CheckSpec, compiled_state)}`` so a pickled Schema
    #: carries its checks into Ray worker processes where the process-local
    #: registry is empty (engine/registry.py); empty unless third-party
    #: checks are registered
    custom: dict[str, Any] = field(default_factory=dict)

    def sorted_properties(self) -> list[tuple[str, "Schema"]]:
        """Properties in BTreeMap (lexicographic) order."""
        return sorted(self.properties.items(), key=lambda kv: kv[0])


def _expect(cond: bool, msg: str) -> None:
    if not cond:
        raise SchemaParseError(msg)


def _parse_type(v: Any) -> Optional[str]:
    # Single string, or array of strings truncated to the first element
    # (json_schema.rs:96-114; design.md "type" limitation).
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        for x in v:
            _expect(isinstance(x, str), "type array entries must be strings")
        return v[0] if v else None
    raise SchemaParseError("type must be a string or an array of strings")


def _parse_u64(v: Any, key: str) -> int:
    _expect(isinstance(v, int) and not isinstance(v, bool) and v >= 0,
            f"{key} must be a non-negative integer")
    return v


def _parse_f64(v: Any, key: str) -> float:
    _expect(isinstance(v, (int, float)) and not isinstance(v, bool),
            f"{key} must be a number")
    return float(v)


def _parse_schema_map(v: Any, key: str, strict: bool) -> dict[str, Schema]:
    _expect(isinstance(v, dict), f"{key} must be an object")
    return {k: _parse_node(s, strict) for k, s in sorted(v.items())}


def _parse_node(v: Any, strict: bool) -> Schema:
    from engine.registry import get_check, registered_keywords
    _expect(isinstance(v, dict), "schema must be a JSON object")
    registered = registered_keywords()
    if strict:
        unknown = sorted(set(v.keys()) - KNOWN_KEYS - registered)
        _expect(not unknown, f"unknown field(s) in schema: {', '.join(unknown)}")
    s = Schema()
    for key, val in v.items():
        if key in registered:
            try:
                spec = get_check(key)
                s.custom[key] = (spec, spec.compile(val))
            except SchemaParseError:
                raise
            except Exception as e:  # noqa: BLE001 - schema error surface
                raise SchemaParseError(
                    f"invalid value for custom keyword {key}: {e}") from e
            continue
        if key == "$schema":
            _expect(isinstance(val, str), "$schema must be a string")
            s.schema_uri = val
        elif key == "$id":
            _expect(isinstance(val, str), "$id must be a string")
            s.id = val
        elif key == "$ref":
            _expect(isinstance(val, str), "$ref must be a string")
            s.ref = val
        elif key == "type":
            s.type = _parse_type(val)
        elif key == "$defs":
            s.defs = _parse_schema_map(val, "$defs", strict)
        elif key == "definitions":
            s.definitions = _parse_schema_map(val, "definitions", strict)
        elif key == "properties":
            s.properties = _parse_schema_map(val, "properties", strict)
        elif key == "additionalProperties":
            if val is True:
                s.additional_properties = AP_ALLOW
            elif val is False:
                s.additional_properties = AP_FORBID
            elif isinstance(val, dict):
                s.additional_properties = _parse_node(val, strict)
            else:
                raise SchemaParseError(
                    "additionalProperties must be a boolean or a schema object")
        elif key == "required":
            _expect(isinstance(val, list) and all(isinstance(x, str) for x in val),
                    "required must be an array of strings")
            s.required = list(val)
        elif key == "title":
            _expect(isinstance(val, str), "title must be a string")
            s.title = val
        elif key == "description":
            _expect(isinstance(val, str), "description must be a string")
            s.description = val
        elif key == "$comment":
            _expect(isinstance(val, str), "$comment must be a string")
            s.comment = val
        elif key == "enum":
            _expect(isinstance(val, list), "enum must be an array")
            s.enum = list(val)
        elif key == "const":
            s.const = val
        elif key == "items":
            _expect(isinstance(val, dict),
                    "items must be a schema object (single-schema form only)")
            s.items = _parse_node(val, strict)
        elif key == "uniqueItems":
            _expect(isinstance(val, bool), "uniqueItems must be a boolean")
            s.unique_items = val
        elif key == "minItems":
            s.min_items = _parse_u64(val, "minItems")
        elif key == "maxItems":
            s.max_items = _parse_u64(val, "maxItems")
        elif key == "minimum":
            s.minimum = _parse_f64(val, "minimum")
        elif key == "maximum":
            s.maximum = _parse_f64(val, "maximum")
        elif key == "minLength":
            s.min_length = _parse_u64(val, "minLength")
        elif key == "maxLength":
            s.max_length = _parse_u64(val, "maxLength")
        elif key == "pattern":
            _expect(isinstance(val, str), "pattern must be a string")
            s.pattern = val
        elif key == "format":
            _expect(isinstance(val, str), "format must be a string")
            s.format = val
        elif key == "default":
            s.default = val
        elif key == "deprecated":
            _expect(isinstance(val, bool), "deprecated must be a boolean")
            s.deprecated = val
        elif key == "examples":
            _expect(isinstance(val, list), "examples must be an array")
            s.examples = list(val)
        elif key == "allOf":
            _expect(isinstance(val, list), "allOf must be an array")
            s.all_of = [_parse_node(x, strict) for x in val]
        elif key == "anyOf":
            _expect(isinstance(val, list), "anyOf must be an array")
            s.any_of = [_parse_node(x, strict) for x in val]
        elif key == "oneOf":
            _expect(isinstance(val, list), "oneOf must be an array")
            s.one_of = [_parse_node(x, strict) for x in val]
        else:
            pass  # lenient: unknown keys ignored (strict already rejected them)
    return s


def parse_schema(src: Union[str, bytes, dict], *, strict: bool = False) -> Schema:
    """Parse a schema from JSON text/bytes or an already-decoded dict.

    ``strict=True`` == reference ``disallow_unknown_fields``; the default is
    lenient (unknown keys ignored), matching the reference default settings.
    Mirrors the reference's five constructors ``new_from_str/slice/serde_value/
    reader/path`` (``json_schema.rs:~600-700``) — paths/readers are handled by
    :func:`parse_schema_path`.
    """
    if isinstance(src, (str, bytes)):
        try:
            decoded = json.loads(src)
        except json.JSONDecodeError as e:
            raise SchemaParseError(f"invalid JSON: {e}") from e
    else:
        decoded = src
    return _parse_node(decoded, strict)


def parse_schema_path(path: str, *, strict: bool = False) -> Schema:
    with open(path, "rb") as f:
        return parse_schema(f.read(), strict=strict)


def schema_to_dict(s: Schema) -> dict:
    """Serialize back to schema JSON with the reference's skip rules and
    field order (``json_schema.rs:277-403``): keys emitted in struct
    declaration order; ``$defs``/``definitions``/``properties``/``required``/
    ``enum``/``allOf``/``anyOf``/``oneOf`` skipped when None OR empty; other
    optionals skipped when None; ``additionalProperties`` tri-state re-emits
    true/false/schema."""
    out: dict[str, Any] = {}
    if s.schema_uri is not None:
        out["$schema"] = s.schema_uri
    if s.id is not None:
        out["$id"] = s.id
    if s.ref is not None:
        out["$ref"] = s.ref
    if s.type is not None:
        out["type"] = s.type
    if s.defs:
        out["$defs"] = {k: schema_to_dict(v)
                        for k, v in sorted(s.defs.items())}
    if s.definitions:
        out["definitions"] = {k: schema_to_dict(v)
                              for k, v in sorted(s.definitions.items())}
    if s.properties:
        out["properties"] = {k: schema_to_dict(v)
                             for k, v in sorted(s.properties.items())}
    ap = s.additional_properties
    if ap is not None:
        out["additionalProperties"] = (
            True if ap == AP_ALLOW else
            False if ap == AP_FORBID else schema_to_dict(ap))
    if s.required:
        out["required"] = list(s.required)
    if s.title is not None:
        out["title"] = s.title
    if s.description is not None:
        out["description"] = s.description
    if s.comment is not None:
        out["$comment"] = s.comment
    if s.enum:
        out["enum"] = list(s.enum)
    if s.const is not UNSET:
        out["const"] = s.const
    if s.items is not None:
        out["items"] = schema_to_dict(s.items)
    if s.unique_items is not None:
        out["uniqueItems"] = s.unique_items
    if s.min_items is not None:
        out["minItems"] = s.min_items
    if s.max_items is not None:
        out["maxItems"] = s.max_items
    if s.minimum is not None:
        out["minimum"] = s.minimum
    if s.maximum is not None:
        out["maximum"] = s.maximum
    if s.min_length is not None:
        out["minLength"] = s.min_length
    if s.max_length is not None:
        out["maxLength"] = s.max_length
    if s.pattern is not None:
        out["pattern"] = s.pattern
    if s.format is not None:
        out["format"] = s.format
    if s.default is not UNSET:
        out["default"] = s.default
    if s.deprecated is not None:
        out["deprecated"] = s.deprecated
    if s.examples is not None:
        out["examples"] = list(s.examples)
    if s.all_of:
        out["allOf"] = [schema_to_dict(x) for x in s.all_of]
    if s.any_of:
        out["anyOf"] = [schema_to_dict(x) for x in s.any_of]
    if s.one_of:
        out["oneOf"] = [schema_to_dict(x) for x in s.one_of]
    return out


#: Canonical meta-schema URIs -> draft names, exact matching per the
#: reference ``SpecVersion::from_schema_uri`` (``spec_version.rs:48-75``):
#: trailing slash stripped, the legacy ``http://json-schema.org/schema#``
#: resolves to Draft04. The version is an inert annotation — it does not
#: change validation behavior, matching the reference today.
_SPEC_URIS = {
    "http://json-schema.org/draft-00/hyper-schema#": "Draft00",
    "http://json-schema.org/draft-01/hyper-schema#": "Draft01",
    "http://json-schema.org/draft-02/hyper-schema#": "Draft02",
    "http://json-schema.org/draft-03/schema#": "Draft03",
    "http://json-schema.org/draft-04/schema#": "Draft04",
    "http://json-schema.org/schema#": "Draft04",  # legacy deprecated alias
    "http://json-schema.org/draft-05/schema#": "Draft05",
    "http://json-schema.org/draft-06/schema#": "Draft06",
    "http://json-schema.org/draft-07/schema#": "Draft07",
    "https://json-schema.org/draft/2019-09/schema": "Draft201909",
    "https://json-schema.org/draft/2020-12/schema": "Draft202012",
}


def spec_version_from_uri(uri: str):
    """Exact-URI draft lookup (``spec_version.rs:48-75``): trimmed, trailing
    slash normalized; None for empty/unknown/malformed."""
    u = (uri or "").strip()
    if not u:
        return None
    return _SPEC_URIS.get(u.rstrip("/")) or _SPEC_URIS.get(u)


def infer_spec_version(schema: Schema) -> str:
    """Draft inference from the root ``$schema`` URI; Draft202012 when
    absent or unrecognized (``settings.rs:19-21`` inference rule)."""
    return spec_version_from_uri(schema.schema_uri or "") or "Draft202012"
