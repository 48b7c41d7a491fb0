"""Row <-> JSON conversion under the engine's Arrow mapping contract.

Contract (see ``engine/kernels.py`` module docstring): column / struct-field
NULL == absent key; list-element NULL == JSON ``null``. Used to feed the
row-wise oracle (:mod:`engine.oracle`) with exactly the JSON instances the
vectorized kernels see, so engine-vs-oracle diffs are well-defined.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa


def _convert(v: Any) -> Any:
    if isinstance(v, dict):
        return {k: _convert(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [None if x is None else _convert(x) for x in v]
    return v


def table_to_json_rows(batch: pa.Table) -> list[dict]:
    """Each row as the JSON object instance the kernels logically validate."""
    rows = batch.to_pylist()
    return [{k: _convert(x) for k, x in row.items() if x is not None}
            for row in rows]
