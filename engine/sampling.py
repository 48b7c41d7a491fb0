"""Deterministic sampling / splitting for training-data pipelines.

Splits are pure functions of the key (md5-derived bucket in [0, 10000)), so
they are reproducible at any parallelism, any block order, and any resume
point — and a SQL oracle can reproduce them bit-for-bit (DuckDB
``md5(key)``). The md5 path is the oracle-exact mode; ``fast=True`` swaps in
the vectorized splitmix hash (engine-deterministic, not SQL-reproducible) for
the 100 TB hot path.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from engine.sketches import hash64

#: bucket space = first 8 md5 hex chars as uint32; thresholds compare equal
#: whether done numerically (engine) or as zero-padded hex strings (SQL:
#: ``substr(md5(key), 1, 8) < printf('%08x', threshold)``)
BUCKETS = 2**32


def _md5_buckets(keys: list) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        h = hashlib.md5(str(k).encode("utf-8")).hexdigest()
        out[i] = int(h[:8], 16)
    return out


def _fast_buckets(keys: np.ndarray) -> np.ndarray:
    return (hash64(keys, seed=17) % np.uint64(BUCKETS)).astype(np.int64)


def assign_split(ds, *, key_col: str = "doc_id", train_frac: float = 0.9,
                 fast: bool = False, batch_size: int = 65536,
                 concurrency=None):
    """Adds a ``split`` column ("train"/"test") keyed on a stable hash bucket
    of ``key_col``."""
    threshold = int(train_frac * BUCKETS)

    def _fn(batch: pa.Table) -> pa.Table:
        if fast:
            b = _fast_buckets(
                batch.column(key_col).to_numpy(zero_copy_only=False))
        else:
            b = _md5_buckets(batch.column(key_col).to_pylist())
        split = np.where(b < threshold, "train", "test")
        return batch.append_column("split",
                                   pa.array(split.tolist(), pa.string()))

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def sample_fraction(ds, frac: float, *, key_col: str = "doc_id",
                    fast: bool = False, batch_size: int = 65536,
                    concurrency=None):
    """Deterministic ~frac sample by key-hash bucket (no global state, no
    shuffle; the same keys are selected on every run)."""
    threshold = int(frac * BUCKETS)

    def _fn(batch: pa.Table) -> pa.Table:
        if fast:
            b = _fast_buckets(
                batch.column(key_col).to_numpy(zero_copy_only=False))
        else:
            b = _md5_buckets(batch.column(key_col).to_pylist())
        return batch.filter(pa.array(b < threshold))

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def stratified_sample(ds, fractions: dict, *, strat_col: str,
                      key_col: str = "doc_id", default_frac: float = 0.0,
                      fast: bool = False, batch_size: int = 65536,
                      concurrency=None):
    """Deterministic per-stratum sampling: stratum ``g`` keeps ~
    ``fractions[g]`` of its rows (``default_frac`` otherwise), selected by
    a hash bucket of ``key || '|' || stratum`` — salting with the stratum
    decorrelates the kept key sets across strata, so downsampling one
    class never biases another.

    Map-only like the other samplers: no shuffle, no global state, stable
    under any parallelism / block order / resume point. The per-stratum
    threshold table is O(strata) and rides the task closure. The md5 mode
    is SQL-reproducible (DuckDB ``substr(md5(key || '|' ||
    coalesce(stratum, '')),1,8)`` against per-stratum
    ``printf('%08x', t)`` thresholds); ``fast=True`` swaps in the
    splitmix hash for the 100 TB hot path. A NULL stratum salts with the
    empty string and samples at ``default_frac``.
    """
    thresholds = {g: int(f * BUCKETS) for g, f in fractions.items()}
    default_thr = int(default_frac * BUCKETS)

    def _fn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        strata = batch.column(strat_col).to_pylist()
        combined = [f"{k}|{'' if s is None else s}"
                    for k, s in zip(keys, strata)]
        if fast:
            b = _fast_buckets(np.array(combined, dtype=object))
        else:
            b = _md5_buckets(combined)
        thr = np.array([thresholds.get(s, default_thr) for s in strata],
                       dtype=np.int64)
        return batch.filter(pa.array(b < thr))

    return ds.map_batches(_fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size, concurrency=concurrency)


def reservoir_sample(ds, k: int, *, seed: int = 23,
                     batch_size: int = 65536) -> pa.Table:
    """Exact-size uniform sample via per-batch weighted keep + driver merge:
    each row draws a stable pseudo-random priority from (seed, block row);
    the global top-k priorities win. Deterministic given fixed input order
    within blocks; merge cost is (batches x k) rows only."""
    import heapq

    best: list = []  # (priority, payload) min-heap of size k
    counter = 0

    for batch in ds.iter_batches(batch_format="pyarrow",
                                 batch_size=batch_size):
        n = len(batch)
        rng = np.random.default_rng(seed ^ counter)
        pri = rng.random(n)
        counter += 1
        take_n = min(k, n)
        idx = np.argpartition(-pri, take_n - 1)[:take_n] if take_n < n \
            else np.arange(n)
        rows = batch.take(pa.array(idx)).to_pylist()
        for j, r in zip(idx.tolist(), rows):
            item = (float(pri[j]), counter, j, r)
            if len(best) < k:
                heapq.heappush(best, item)
            elif item[0] > best[0][0]:
                heapq.heapreplace(best, item)
    rows = [r for _, _, _, r in sorted(best, reverse=True)]
    if not rows:
        return pa.table({})
    return pa.Table.from_pylist(rows)
