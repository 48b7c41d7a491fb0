"""Storage abstraction: Lance when importable, Parquet-fragment directories
otherwise (SURVEY.md §4 sandbox note; BASELINE.json input_hint names a Lance
table of interleaved documents).

The two layouts expose the same Arrow schema and the same partition-directory
resumability contract, so every pipeline in this repo is written against
``read_table_dataset`` / ``write_table_dataset`` and switches engines by
availability (or explicitly via ``format=``). This container has no ``lance``
module — the Lance path is importable-optional and exercised only for its
graceful fallback here.
"""

from __future__ import annotations

import importlib.util
from typing import Optional


def lance_available() -> bool:
    return importlib.util.find_spec("lance") is not None


def resolve_format(fmt: Optional[str] = None) -> str:
    """"lance" | "parquet"; default prefers Lance when importable."""
    if fmt in ("lance", "parquet"):
        if fmt == "lance" and not lance_available():
            raise ImportError(
                "lance requested but the 'lance' module is not installed; "
                "use format='parquet' (identical schema + layout contract)")
        return fmt
    return "lance" if lance_available() else "parquet"


def read_table_dataset(path: str, *, fmt: Optional[str] = None,
                       columns=None, **kwargs):
    """ray.data Dataset from a Lance dataset or a Parquet directory."""
    import ray.data

    fmt = resolve_format(fmt)
    if fmt == "lance":  # pragma: no cover - lance absent in this container
        return ray.data.read_lance(path, columns=columns, **kwargs)
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table_dataset(ds, path: str, *, fmt: Optional[str] = None,
                        partition_cols=None, mode: str = "append", **kwargs):
    fmt = resolve_format(fmt)
    if fmt == "lance":  # pragma: no cover
        return ds.write_lance(path, **kwargs)
    return ds.write_parquet(path, partition_cols=partition_cols, mode=mode,
                            **kwargs)
