"""Validation error model: kinds, context fields, one-line Display parity.

Parity target: reference ``json_schema_rs/src/validator/error.rs`` — the
22-variant error enum (``:20-205``) and its single-line Display templates
(``:241-398``). Errors are plain dicts::

    {"kind": <Kind>, "path": tuple[str, ...], ...context}

plus helpers that reproduce the reference's display-string semantics:

* ``canonical_json`` == ``serde_json::to_string`` (compact separators, keys in
  lexicographic/BTreeMap order, ryu-style float text, no ASCII escaping) —
  reference ``validator/mod.rs:27-29`` and serde_json without preserve_order.
* ``rust_f64`` == Rust ``{}`` Display for f64 (shortest round-trip digits,
  never scientific notation) used by Below/AboveMinimum messages
  (``error.rs:328-345``).
"""

from __future__ import annotations

from decimal import Decimal
from typing import Any

from engine.pointer import display_root_or_path

# Error kinds (string constants; values are the reference's variant names).
INVALID_REF = "InvalidRef"
EXPECTED_OBJECT = "ExpectedObject"
EXPECTED_STRING = "ExpectedString"
EXPECTED_INTEGER = "ExpectedInteger"
EXPECTED_NUMBER = "ExpectedNumber"
EXPECTED_ARRAY = "ExpectedArray"
EXPECTED_BOOLEAN = "ExpectedBoolean"
DUPLICATE_ARRAY_ITEMS = "DuplicateArrayItems"
TOO_FEW_ITEMS = "TooFewItems"
TOO_MANY_ITEMS = "TooManyItems"
MISSING_REQUIRED = "MissingRequired"
DISALLOWED_ADDITIONAL_PROPERTY = "DisallowedAdditionalProperty"
NOT_IN_ENUM = "NotInEnum"
NOT_CONST = "NotConst"
BELOW_MINIMUM = "BelowMinimum"
ABOVE_MAXIMUM = "AboveMaximum"
TOO_SHORT = "TooShort"
TOO_LONG = "TooLong"
PATTERN_MISMATCH = "PatternMismatch"
INVALID_PATTERN_IN_SCHEMA = "InvalidPatternInSchema"
INVALID_UUID_FORMAT = "InvalidUuidFormat"  # feature-gated in the reference
NO_SUBSCHEMA_MATCHED = "NoSubschemaMatched"
MULTIPLE_SUBSCHEMAS_MATCHED = "MultipleSubschemasMatched"

ALL_KINDS = [
    INVALID_REF, EXPECTED_OBJECT, EXPECTED_STRING, EXPECTED_INTEGER,
    EXPECTED_NUMBER, EXPECTED_ARRAY, EXPECTED_BOOLEAN, DUPLICATE_ARRAY_ITEMS,
    TOO_FEW_ITEMS, TOO_MANY_ITEMS, MISSING_REQUIRED,
    DISALLOWED_ADDITIONAL_PROPERTY, NOT_IN_ENUM, NOT_CONST, BELOW_MINIMUM,
    ABOVE_MAXIMUM, TOO_SHORT, TOO_LONG, PATTERN_MISMATCH,
    INVALID_PATTERN_IN_SCHEMA, INVALID_UUID_FORMAT, NO_SUBSCHEMA_MATCHED,
    MULTIPLE_SUBSCHEMAS_MATCHED,
]


def json_type_name(v: Any) -> str:
    """JSON type name for "got" context (reference ``validator/mod.rs:15-24``)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v)!r}")


def rust_f64(x: float) -> str:
    """Rust ``{}`` Display for f64: shortest round-trip, plain decimal notation."""
    if x != x or x in (float("inf"), float("-inf")):  # not producible from JSON
        return "NaN" if x != x else ("inf" if x > 0 else "-inf")
    if x == 0.0:
        return "-0" if str(x)[0] == "-" else "0"
    if float(x).is_integer() and abs(x) < 1e17:
        return str(int(x))
    r = repr(float(x))
    if "e" in r or "E" in r:
        # Expand shortest-digits scientific form to plain decimal (Rust never
        # prints exponents from Display).
        return format(Decimal(r), "f")
    return r


def ryu_float(x: float) -> str:
    """serde_json (ryu) float text: like Python repr but ``1e+21`` -> ``1e21``,
    ``1e-07`` -> ``1e-7``; integral floats keep a trailing ``.0``."""
    r = repr(float(x))
    if "e" in r:
        mant, exp = r.split("e")
        exp_i = int(exp)
        return f"{mant}e{exp_i}"
    return r


def _escape_json_string(s: str) -> str:
    out = []
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\b":
            out.append("\\b")
        elif ch == "\f":
            out.append("\\f")
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def canonical_json(v: Any) -> str:
    """Compact JSON text matching ``serde_json::to_string`` on a BTreeMap-backed
    Value: keys sorted, ``,``/``:`` separators, non-ASCII verbatim, ryu floats."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return ryu_float(v)
    if isinstance(v, str):
        return '"' + _escape_json_string(v) + '"'
    if isinstance(v, list):
        return "[" + ",".join(canonical_json(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: kv[0])
        return "{" + ",".join(
            '"' + _escape_json_string(k) + '":' + canonical_json(val)
            for k, val in items
        ) + "}"
    raise TypeError(f"not a JSON value: {type(v)!r}")


def json_equal(a: Any, b: Any) -> bool:
    """serde_json Value equality: int and float are distinct number kinds
    (``1 != 1.0``), bool is not a number; deep for arrays/objects."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, int) and isinstance(b, int):
        return a == b
    if isinstance(a, float) and isinstance(b, float):
        return a == b
    if isinstance(a, (int, float)) or isinstance(b, (int, float)):
        return False  # int vs float -> different serde Number variants
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(json_equal(a[k], b[k]) for k in a)
    return False


def render_message(err: dict) -> str:
    """One-line Display string for an error dict (``error.rs:241-398``)."""
    location = display_root_or_path(err["path"])
    k = err["kind"]
    if "custom_message" in err:  # registry-registered check (engine/registry.py)
        return f"{location}: {err['custom_message']}"
    if k == INVALID_REF:
        return f'{location}: could not resolve $ref "{err["ref_str"]}": {err["reason"]}'
    if k == EXPECTED_OBJECT:
        return f"{location}: expected object, got {err['got']}"
    if k == EXPECTED_STRING:
        return f"{location}: expected string, got {err['got']}"
    if k == EXPECTED_INTEGER:
        return f"{location}: expected integer, got {err['got']}"
    if k == EXPECTED_NUMBER:
        return f"{location}: expected number, got {err['got']}"
    if k == EXPECTED_ARRAY:
        return f"{location}: expected array, got {err['got']}"
    if k == EXPECTED_BOOLEAN:
        return f"{location}: expected boolean, got {err['got']}"
    if k == DUPLICATE_ARRAY_ITEMS:
        return f"{location}: array has duplicate items (value: {err['duplicate_value']})"
    if k == TOO_FEW_ITEMS:
        return (f"{location}: array has {err['actual_count']} item(s), "
                f"minimum is {err['min_items']}")
    if k == TOO_MANY_ITEMS:
        return (f"{location}: array has {err['actual_count']} item(s), "
                f"maximum is {err['max_items']}")
    if k == MISSING_REQUIRED:
        return f'{location}: missing required property "{err["property"]}"'
    if k == DISALLOWED_ADDITIONAL_PROPERTY:
        return f'{location}: additional property "{err["property"]}" not allowed'
    if k == NOT_IN_ENUM:
        allowed = ", ".join(err["allowed"])
        return f"{location}: value {err['invalid_value']} not in enum (allowed: {allowed})"
    if k == NOT_CONST:
        return (f"{location}: value {err['actual']} does not match const "
                f"(expected: {err['expected']})")
    if k == BELOW_MINIMUM:
        return (f"{location}: value {rust_f64(err['actual'])} is below minimum "
                f"{rust_f64(err['minimum'])}")
    if k == ABOVE_MAXIMUM:
        return (f"{location}: value {rust_f64(err['actual'])} is above maximum "
                f"{rust_f64(err['maximum'])}")
    if k == TOO_SHORT:
        return (f"{location}: string has {err['actual_length']} code points, "
                f"minLength is {err['min_length']}")
    if k == TOO_LONG:
        return (f"{location}: string has {err['actual_length']} code points, "
                f"maxLength is {err['max_length']}")
    if k == PATTERN_MISMATCH:
        return (f'{location}: string "{err["value"]}" does not match pattern '
                f'"{err["pattern"]}"')
    if k == INVALID_PATTERN_IN_SCHEMA:
        return f'{location}: schema has invalid pattern "{err["pattern"]}"'
    if k == INVALID_UUID_FORMAT:
        return f'{location}: string "{err["value"]}" is not a valid UUID'
    if k == NO_SUBSCHEMA_MATCHED:
        return (f"{location}: instance does not match any of the "
                f"{err['subschema_count']} subschema(s)")
    if k == MULTIPLE_SUBSCHEMAS_MATCHED:
        return (f"{location}: instance matches {err['match_count']} of the "
                f"{err['subschema_count']} oneOf subschema(s), exactly one required")
    raise ValueError(f"unknown error kind {k!r}")
