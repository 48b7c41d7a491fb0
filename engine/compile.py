"""Schema -> ConstraintPlan compiler (driver-side, runs once per job).

The reference resolves ``$ref`` lazily at every stack pop
(``validator/mod.rs:68-82``) and recompiles regexes per string instance
(``:259-277``). We do both ONCE here: refs are resolved transitively at
compile time (unresolvable / cyclic refs compile to a constant per-row
``InvalidRef`` emitter carrying the same Debug-formatted reason), and each
pattern is triaged (RE2-safe -> zero-copy ``pc.match_substring_regex``;
otherwise a compiled Python regex batch kernel; invalid -> constant
``InvalidPatternInSchema`` emitter). Observable behavior is unchanged.

Recursive schemas (a ``$defs`` entry reaching itself through ``properties`` /
``items``) are legal in the reference because resolution is lazy; we support
them by memoizing plan nodes on the resolved schema object, producing a plan
*graph*. Evaluation depth is bounded by the Arrow type depth of the data, so
evaluation always terminates.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

from engine import refs
from engine.ecma import compile_ecma, re2_safe
from engine.schema import AP_ALLOW, AP_FORBID, UNSET, Schema


@dataclass
class PatternCheck:
    pattern: str
    invalid: bool = False          # -> constant InvalidPatternInSchema
    re2: Optional[str] = None      # safe for pc.match_substring_regex
    rx: Any = None                 # compiled Python regex (fallback kernel)


@dataclass
class Plan:
    """One node of the compiled constraint plan (mirrors the oracle's
    per-node keyword evaluation; see ``engine/oracle.py``)."""

    ref_error: Optional[tuple[str, str]] = None  # (ref_str, reason_debug)
    const: Any = UNSET
    enum: Optional[list] = None
    any_of: Optional[list["Plan"]] = None
    one_of: Optional[list["Plan"]] = None
    all_of: Optional[list["Plan"]] = None
    type: Optional[str] = None
    required: Optional[list[str]] = None
    properties: list[tuple[str, "Plan"]] = field(default_factory=list)
    additional: Union[None, str, "Plan"] = None  # None/AP_ALLOW/AP_FORBID/Plan
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[PatternCheck] = None
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: bool = False
    items: Optional["Plan"] = None
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    format_uuid: bool = False  # set only when engine.config.UUID_FORMAT
    # compile-time display caches (recomputing canonical JSON per failing
    # row is measurable in the hot path)
    enum_allowed_display: Optional[list[str]] = None
    const_display: Optional[str] = None
    #: registry-registered custom checks: [(CheckSpec, state)] applicable to
    #: this node's type arm, lexicographic keyword order (engine/registry.py)
    custom: list = field(default_factory=list)


def compile_plan(schema: Schema, root: Optional[Schema] = None) -> Plan:
    """Compile a parsed schema into an evaluable plan graph."""
    if root is None:
        root = schema
    memo: dict[int, Plan] = {}
    return _compile(schema, root, memo)


def _compile(node: Schema, root: Schema, memo: dict[int, Plan]) -> Plan:
    original_ref = node.ref
    try:
        resolved = refs.resolve_transitive(root, node)
    except refs.RefError as e:
        return Plan(ref_error=(
            original_ref if original_ref is not None else "<missing>",
            e.debug(),
        ))
    key = id(resolved)
    if key in memo:
        return memo[key]
    p = Plan()
    memo[key] = p  # register before recursing: recursive schemas -> graph
    s = resolved
    p.const = s.const
    p.enum = list(s.enum) if s.enum is not None else None
    from engine.errors import canonical_json
    if s.const is not UNSET:
        p.const_display = canonical_json(s.const)
    if s.enum:
        p.enum_allowed_display = [canonical_json(m) for m in s.enum]
    if s.any_of is not None:
        p.any_of = [_compile(b, root, memo) for b in s.any_of]
    if s.one_of is not None:
        p.one_of = [_compile(b, root, memo) for b in s.one_of]
    if s.all_of is not None and s.all_of:
        p.all_of = [_compile(b, root, memo) for b in s.all_of]
    p.type = s.type
    p.required = list(s.required) if s.required is not None else None
    p.properties = [(k, _compile(sub, root, memo))
                    for k, sub in s.sorted_properties()]
    ap = s.additional_properties
    if ap is None or ap in (AP_ALLOW, AP_FORBID):
        p.additional = ap
    else:
        p.additional = _compile(ap, root, memo)
    p.min_length = s.min_length
    p.max_length = s.max_length
    if s.pattern is not None:
        rx = compile_ecma(s.pattern)
        if rx is None:
            p.pattern = PatternCheck(s.pattern, invalid=True)
        elif re2_safe(s.pattern):
            p.pattern = PatternCheck(s.pattern, re2=s.pattern, rx=rx)
        else:
            p.pattern = PatternCheck(s.pattern, rx=rx)
    p.min_items = s.min_items
    p.max_items = s.max_items
    p.unique_items = s.unique_items is True
    if s.items is not None:
        p.items = _compile(s.items, root, memo)
    p.minimum = s.minimum
    p.maximum = s.maximum
    from engine import config
    p.format_uuid = bool(config.UUID_FORMAT and s.format == "uuid")
    if s.custom:
        from engine.registry import checks_for
        p.custom = checks_for(s.custom, s.type)
    return p
