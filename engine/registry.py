"""Pluggable check-emitter registry (SURVEY §2.6).

Engine analog of the reference's codegen extension contract
(``code_gen/mod.rs:27-40`` ``CodeGenBackend``): a third party registers a new
constraint keyword with a compile function and predicates, and the keyword
participates end-to-end —

* schema parse accepts it (lenient AND strict mode),
* the row-wise oracle evaluates it (``engine/oracle.py``),
* the typed Arrow kernels evaluate it vectorized (``engine/kernels.py``,
  both the emitting path and the anyOf/oneOf validity path),
* message rendering uses the spec's own formatter.

Custom checks run AFTER every built-in check of their type arm, in
lexicographic keyword order — identically in the oracle and the kernels, so
differential parity is preserved by construction. The dynamic-JSON fast path
routes rows touching custom-keyword properties to the oracle.

Example (the classic missing keyword)::

    import numpy as np
    import pyarrow.compute as pc
    from engine.registry import CheckSpec, register_check

    register_check(CheckSpec(
        keyword="multipleOf",
        kind="NotMultipleOf",
        types=("integer", "number"),
        compile=lambda raw: float(raw),
        predicate=lambda state, val, active: ~active | np.isclose(
            np.mod(pc.cast(val, "float64").to_numpy(zero_copy_only=False),
                   state), 0) | np.isclose(
            np.mod(pc.cast(val, "float64").to_numpy(zero_copy_only=False),
                   state), state),
        scalar_predicate=lambda state, v: float(v) % state in (0.0, state),
        message=lambda state, v: f"value {v} is not a multiple of {state}",
    ))
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class CheckSpec:
    """One registered constraint keyword.

    predicate(state, values: pa.Array, active: np.ndarray) -> np.ndarray of
    bool, True where the check PASSES; rows outside ``active`` are ignored.
    scalar_predicate(state, python_value) -> bool is the oracle-path twin
    and MUST agree with ``predicate`` on every value (differential-tested).
    """

    keyword: str
    kind: str
    types: tuple
    compile: Callable[[Any], Any]
    predicate: Callable[[Any, pa.Array, np.ndarray], np.ndarray]
    scalar_predicate: Callable[[Any, Any], bool]
    message: Callable[[Any, Any], str]


_REGISTRY: dict[str, CheckSpec] = {}


def register_check(spec: CheckSpec) -> None:
    if spec.keyword in _REGISTRY:
        raise ValueError(f"keyword already registered: {spec.keyword}")
    from engine.schema import KNOWN_KEYS  # lazy: schema imports registry
    if spec.keyword in KNOWN_KEYS:
        raise ValueError(
            f"keyword {spec.keyword!r} shadows a built-in schema keyword")
    _REGISTRY[spec.keyword] = spec


def unregister_check(keyword: str) -> None:
    _REGISTRY.pop(keyword, None)


def get_check(keyword: str) -> CheckSpec | None:
    return _REGISTRY.get(keyword)


def registered_keywords() -> frozenset:
    return frozenset(_REGISTRY)


def checks_for(schema_custom: dict, type_: str | None):
    """(spec, state) pairs applicable under a type arm, in lexicographic
    keyword order — THE shared iteration order for oracle and kernels.

    ``schema_custom`` maps keyword -> (CheckSpec, compiled_state), resolved
    at parse time (engine/schema.py) so validation never consults the
    process-local registry — a pickled Schema evaluates identically in a
    Ray worker where ``_REGISTRY`` is empty."""
    out = []
    for kw in sorted(schema_custom):
        spec, state = schema_custom[kw]
        if type_ in spec.types:
            out.append((spec, state))
    return out
