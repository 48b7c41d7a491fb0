"""Row-wise oracle validator: exact reference semantics, one document at a time.

This is the engine's ground truth for tests (SURVEY.md §5b): a faithful
re-implementation of the reference's explicit-stack DFS validator
``json_schema_rs/src/validator/mod.rs:53-450`` — same keyword order, same
short-circuits, same quirky child orderings, same error context — operating on
Python JSON values (``json.loads`` output). The vectorized Arrow engine
(:mod:`engine.kernels`) is checked against this on every fixture.

Keyword evaluation order per popped node (``validator/mod.rs:67-171``):

1. ``$ref`` transitive resolve; failure -> ``InvalidRef`` + skip node.
2. ``const`` mismatch -> ``NotConst`` + skip rest of node.
3. non-empty ``enum`` miss -> ``NotInEnum`` + skip rest.
4. ``anyOf`` *present* (even empty) -> evaluate, then skip rest even on pass.
5. ``oneOf`` *present* -> evaluate, then skip rest.
6. non-empty ``allOf`` -> push branches (reversed => popped in branch order),
   skip rest.
7. ``type`` dispatch.

Child orderings produced by the LIFO stack (must match for violation-row
parity): object property children pop in lexicographic key order
(``:192-201``); additionalProperties-schema children are pushed *after* them in
forward key order, so they pop *before* the named properties and in *reverse*
key order (``:220-228``); array elements pop in element order (``:398-407``).
"""

from __future__ import annotations

from typing import Any, Optional

from engine import errors as E
from engine import refs
from engine.ecma import compile_ecma
from engine.schema import AP_ALLOW, AP_FORBID, UNSET, Schema

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1


def _as_f64(v) -> float:
    """Lossy f64 view of a JSON number (reference ``as_f64``); Python big
    ints beyond f64 range clamp to +/-inf instead of raising."""
    try:
        return float(v)
    except OverflowError:
        return float("inf") if v > 0 else float("-inf")


def _is_number(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _is_i64(v: Any) -> bool:
    return isinstance(v, int) and not isinstance(v, bool) and I64_MIN <= v <= I64_MAX


def validate(schema: Schema, instance: Any, root: Optional[Schema] = None) -> list[dict]:
    """Validate one JSON instance; returns all errors in reference emission
    order (empty list == valid). ``root`` defaults to ``schema`` itself."""
    if root is None:
        root = schema
    out: list[dict] = []
    stack: list[tuple[Schema, Any, tuple[str, ...]]] = [(schema, instance, ())]

    while stack:
        node, inst, path = stack.pop()
        try:
            node = refs.resolve_transitive(root, node)
        except refs.RefError as e:
            out.append({
                "kind": E.INVALID_REF,
                "path": path,
                "ref_str": node.ref if node.ref is not None else "<missing>",
                "reason": e.debug(),
            })
            continue

        if node.const is not UNSET and not E.json_equal(inst, node.const):
            out.append({
                "kind": E.NOT_CONST,
                "path": path,
                "expected": E.canonical_json(node.const),
                "actual": E.canonical_json(inst),
            })
            continue

        if node.enum is not None and node.enum and not any(
            E.json_equal(a, inst) for a in node.enum
        ):
            out.append({
                "kind": E.NOT_IN_ENUM,
                "path": path,
                "invalid_value": E.canonical_json(inst),
                "allowed": [E.canonical_json(a) for a in node.enum],
            })
            continue

        if node.any_of is not None:
            if not node.any_of:
                out.append({"kind": E.NO_SUBSCHEMA_MATCHED, "path": path,
                            "subschema_count": 0})
            else:
                if not any(not validate(sub, inst, root) for sub in node.any_of):
                    out.append({"kind": E.NO_SUBSCHEMA_MATCHED, "path": path,
                                "subschema_count": len(node.any_of)})
            continue  # anyOf presence suppresses every sibling keyword

        if node.one_of is not None:
            if not node.one_of:
                out.append({"kind": E.NO_SUBSCHEMA_MATCHED, "path": path,
                            "subschema_count": 0})
            else:
                passes = sum(1 for sub in node.one_of if not validate(sub, inst, root))
                if passes == 0:
                    out.append({"kind": E.NO_SUBSCHEMA_MATCHED, "path": path,
                                "subschema_count": len(node.one_of)})
                elif passes > 1:
                    out.append({"kind": E.MULTIPLE_SUBSCHEMAS_MATCHED, "path": path,
                                "subschema_count": len(node.one_of),
                                "match_count": passes})
            continue

        if node.all_of:
            for sub in reversed(node.all_of):
                stack.append((sub, inst, path))
            continue

        t = node.type
        if t == "object":
            if not isinstance(inst, dict):
                out.append({"kind": E.EXPECTED_OBJECT, "path": path,
                            "got": E.json_type_name(inst)})
                continue
            _object_checks(node, inst, path, out, stack,
                           check_additional=True)
        elif t == "string":
            if not isinstance(inst, str):
                out.append({"kind": E.EXPECTED_STRING, "path": path,
                            "got": E.json_type_name(inst)})
            if isinstance(inst, str):
                n_cp = len(inst)  # Python len == Unicode code points
                if node.min_length is not None and n_cp < node.min_length:
                    out.append({"kind": E.TOO_SHORT, "path": path,
                                "min_length": node.min_length,
                                "actual_length": n_cp})
                if node.max_length is not None and n_cp > node.max_length:
                    out.append({"kind": E.TOO_LONG, "path": path,
                                "max_length": node.max_length,
                                "actual_length": n_cp})
                if node.pattern is not None:
                    rx = compile_ecma(node.pattern)
                    if rx is None:
                        out.append({"kind": E.INVALID_PATTERN_IN_SCHEMA,
                                    "path": path, "pattern": node.pattern})
                    elif rx.search(inst) is None:
                        out.append({"kind": E.PATTERN_MISMATCH, "path": path,
                                    "pattern": node.pattern, "value": inst})
                # format:"uuid" is feature-gated (Cargo.toml:26-27); the
                # engine flag engine.config.UUID_FORMAT defaults OFF to
                # match the reference's default build.
                from engine import config
                if config.UUID_FORMAT and node.format == "uuid":
                    import re as _re
                    if _re.match(config.UUID_REGEX.replace("(?i)", ""),
                                 inst, _re.IGNORECASE) is None:
                        out.append({"kind": E.INVALID_UUID_FORMAT,
                                    "path": path, "value": inst})
                _custom_checks(node, inst, path, out)
        elif t == "integer":
            if not _is_i64(inst):
                out.append({"kind": E.EXPECTED_INTEGER, "path": path,
                            "got": E.json_type_name(inst)})
            else:
                _numeric_bounds(node, _as_f64(inst), path, out)
                _custom_checks(node, inst, path, out)
        elif t == "number":
            if not _is_number(inst):
                out.append({"kind": E.EXPECTED_NUMBER, "path": path,
                            "got": E.json_type_name(inst)})
            else:
                _numeric_bounds(node, _as_f64(inst), path, out)
                _custom_checks(node, inst, path, out)
        elif t == "array":
            if not isinstance(inst, list):
                out.append({"kind": E.EXPECTED_ARRAY, "path": path,
                            "got": E.json_type_name(inst)})
                continue
            n = len(inst)
            if node.min_items is not None and n < node.min_items:
                out.append({"kind": E.TOO_FEW_ITEMS, "path": path,
                            "min_items": node.min_items, "actual_count": n})
            if node.max_items is not None and n > node.max_items:
                out.append({"kind": E.TOO_MANY_ITEMS, "path": path,
                            "max_items": node.max_items, "actual_count": n})
            if node.unique_items is True:
                dup = _first_duplicate(inst)
                if dup is not None:
                    out.append({"kind": E.DUPLICATE_ARRAY_ITEMS, "path": path,
                                "duplicate_value": dup})
            if node.items is not None:
                for i in range(n - 1, -1, -1):  # reversed push => in-order pop
                    stack.append((node.items, inst[i], path + (str(i),)))
        elif t == "boolean":
            if not isinstance(inst, bool):
                out.append({"kind": E.EXPECTED_BOOLEAN, "path": path,
                            "got": E.json_type_name(inst)})
            else:
                _custom_checks(node, inst, path, out)
        else:
            # Type absent or unknown: still required + properties when the
            # instance is an object; NO additionalProperties check in this arm
            # (validator/mod.rs:417-441).
            if isinstance(inst, dict):
                _object_checks(node, inst, path, out, stack,
                               check_additional=False)

    return out


def _custom_checks(node: Schema, inst: Any, path: tuple, out: list) -> None:
    """Registry-registered checks (engine/registry.py), run AFTER every
    built-in check of the node's type arm, lexicographic keyword order —
    mirrored exactly by the vectorized kernels."""
    if not node.custom:
        return
    from engine.registry import checks_for
    for spec, state in checks_for(node.custom, node.type):
        if not spec.scalar_predicate(state, inst):
            out.append({"kind": spec.kind, "path": path,
                        "custom_message": spec.message(state, inst)})


def _numeric_bounds(node: Schema, v: float, path: tuple, out: list) -> None:
    if node.minimum is not None and v < node.minimum:
        out.append({"kind": E.BELOW_MINIMUM, "path": path,
                    "minimum": node.minimum, "actual": v})
    if node.maximum is not None and v > node.maximum:
        out.append({"kind": E.ABOVE_MAXIMUM, "path": path,
                    "maximum": node.maximum, "actual": v})


def _first_duplicate(arr: list) -> Optional[str]:
    """First element (in scan order i<j) equal to a later element, serialized;
    O(n²) full-JSON-equality scan matching ``validator/mod.rs:378-397``."""
    for i in range(len(arr)):
        for j in range(i + 1, len(arr)):
            if E.json_equal(arr[i], arr[j]):
                return E.canonical_json(arr[i])
    return None


def _object_checks(node: Schema, obj: dict, path: tuple, out: list,
                   stack: list, *, check_additional: bool) -> None:
    if node.required is not None:
        for name in node.required:  # required-array order
            if name not in obj:
                out.append({"kind": E.MISSING_REQUIRED, "path": path + (name,),
                            "property": name})
    # Named property children: pushed reversed => popped in lexicographic order.
    pending = [(sub, obj[key], path + (key,))
               for key, sub in node.sorted_properties() if key in obj]
    for item in reversed(pending):
        stack.append(item)
    if not check_additional:
        return
    additional = [k for k in sorted(obj.keys()) if k not in node.properties]
    if additional:
        ap = node.additional_properties
        if ap is None or ap == AP_ALLOW:
            pass
        elif ap == AP_FORBID:
            for key in additional:  # lexicographic (serde BTreeMap) order
                out.append({"kind": E.DISALLOWED_ADDITIONAL_PROPERTY,
                            "path": path + (key,), "property": key})
        else:  # schema: pushed after property children, forward key order
            #   => popped BEFORE named properties, in REVERSE key order
            #   (validator/mod.rs:220-228 ordering quirk).
            for key in additional:
                stack.append((ap, obj[key], path + (key,)))
