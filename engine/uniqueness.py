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
    """Keys occurring more than once: Dataset of (key, dup_count)."""
    from engine.shuffle import balance, reduce_blocks
    partials = balance(ds.map_batches(
        _KeyCountBatch(key, salt_buckets, hot_threshold),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size, concurrency=concurrency),
        reduce_blocks(1))
    salted = partials.groupby(["key", "salt"]).sum("partial")
    totals = salted.groupby("key").sum("sum(partial)")

    def _finalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cnt = b.column("sum(sum(partial))")
        out = pa.table({"key": b.column("key"), "dup_count": cnt})
        return out.filter(pc.greater(cnt, 1))

    return totals.map_batches(_finalize, batch_format="pyarrow")
