"""Global key-uniqueness check: salted two-phase groupby with skew handling.

North-rule requirement: exact duplicate detection on ``doc_id`` at 10^12-doc
scale where one hot key may hold ~0.1N duplicates. Plan (SURVEY.md §7.4):

1. **In-batch combiner** (``map_batches``): collapse each batch to
   ``(key, salt, partial_count)`` with ``salt = hash(key, row) % S`` — a hot
   key's rows scatter over S salt lanes instead of landing in one group.
2. **Salted groupby**: sum partial counts per ``(key, salt)`` — the shuffle
   moves pre-aggregated rows only, and no single group exceeds ~1/S of the
   hot key's rows.
3. **Final groupby**: sum per ``key`` over at most S rows per key; filter
   ``count > 1``.

Output schema: ``(key, dup_count)`` for keys appearing more than once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine.sketches import hash64


class _KeyCountBatch:
    def __init__(self, key: str, salt_buckets: int, hot_threshold: int):
        self.key = key
        self.salt = salt_buckets
        self.hot_threshold = hot_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os
        keys = batch.column(self.key).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(keys, return_counts=True)
        # ADAPTIVE salting: only keys that look hot inside this batch
        # (per-batch count >= hot_threshold) scatter across salt lanes; a
        # uniform key stays in lane 0, so the salted->final shuffle carries
        # ONE row per cold key instead of one per touched lane. The skewed
        # key the salting exists for (~0.1N duplicates) is hot in every
        # batch by construction. Lane choice never affects final counts.
        salt = np.zeros(len(uniq), dtype=np.int32)
        hot = counts >= self.hot_threshold
        if hot.any():
            # per-batch nonce: the SAME hot key must land in DIFFERENT
            # lanes across batches, otherwise it still collapses into one
            # reduce group
            nonce = np.frombuffer(os.urandom(8), dtype=np.uint64)[0]
            salt[hot] = ((hash64(uniq[hot], seed=7) ^ nonce)
                         % np.uint64(self.salt)).astype(np.int32)
        return pa.table({
            "key": pa.array(uniq.tolist()),
            "salt": pa.array(salt),
            "partial": pa.array(counts.astype(np.int64)),
        })


def duplicate_keys(ds, key: str = "doc_id", *, salt_buckets: int = 16,
                   hot_threshold: int = 2,
                   batch_size: int = 65536, concurrency=None):
    """Keys occurring more than once: Dataset of (key, dup_count).

    Both groupby phases use two-level grouping (the engine/dedup.py
    pattern): rows hash to P coarse partitions — phase 1 by (key, salt),
    so a hot key's salt lanes spread over DIFFERENT partitions (the
    explicit skew split); phase 2 by key — and ONE vectorized pandas
    aggregation runs per partition instead of Ray's per-group reduce
    (measured 2.5x on 600k lineitem keys: 9.0s -> 3.6s end-to-end).
    """
    import pandas as pd

    from engine.shuffle import reduce_blocks
    from engine.sketches import _splitmix

    P = reduce_blocks()
    partials = ds.map_batches(
        _KeyCountBatch(key, salt_buckets, hot_threshold),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size, concurrency=concurrency)

    def _part_a(b: pa.Table) -> pa.Table:
        keys = b.column("key").to_numpy(zero_copy_only=False)
        salt = b.column("salt").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = _splitmix(hash64(keys, 3) ^ salt.astype(np.uint64), 5)
        return b.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int64)))

    def _sum_a(df):
        if "key" not in df.columns or not len(df):
            return pd.DataFrame({"key": [], "salt": [], "partial": []})
        return df.groupby(["key", "salt"],
                          as_index=False)["partial"].sum()

    salted = partials.map_batches(_part_a, batch_format="pyarrow") \
        .groupby("part").map_groups(_sum_a, batch_format="pandas")

    def _part_b(df):
        if "key" not in df.columns or not len(df):
            return pd.DataFrame({"key": [], "partial": [], "part2": []})
        with np.errstate(over="ignore"):
            h = hash64(df["key"].to_numpy(), 9)
        out = df[["key", "partial"]].copy()
        out["part2"] = (h % np.uint64(P)).astype(np.int64)
        return out

    def _sum_b(df):
        if "key" not in df.columns or not len(df):
            return pd.DataFrame({"key": [], "dup_count": []})
        g = df.groupby("key", as_index=False)["partial"].sum()
        g = g[g["partial"] > 1]
        return g.rename(columns={"partial": "dup_count"})

    return salted.map_batches(_part_b, batch_format="pandas") \
        .groupby("part2").map_groups(_sum_b, batch_format="pandas")
