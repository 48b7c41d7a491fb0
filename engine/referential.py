"""Referential integrity: every non-empty ``spans.media_ref`` must exist in
the media catalog.

Broadcast semi-join (SURVEY.md §2.4): the catalog side is distilled into a
Bloom filter — built distributedly (per-batch partial Blooms OR-merged, a few
KB..MB each) — then shipped ONCE via ``ray.put`` and read inside every
``map_batches`` task. No shuffle of the documents table. Bloom misses are
definitely dangling (no false negatives); Bloom hits may be false positives
at the configured fpr, so ``exact=True`` swaps in an exact membership set for
small catalogs / correctness oracles, and at scale a second exact pass over
the (rare) hits of suspected-dangling refs is the documented pattern.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.kernels import _decode, _flatten, _is_list_t
from engine.sketches import Bloom


def build_bloom(catalog_ds, column: str = "media_ref", *,
                capacity: Optional[int] = None, fpr: float = 0.01,
                batch_size: int = 65536) -> Bloom:
    """Distributed Bloom build: per-batch partial filters, OR-merged by a
    distributed tree reduction (engine/shuffle.py tree_reduce) so the
    driver merges O(cluster) partials, never one bitmap per batch."""
    from engine.shuffle import tree_reduce

    if capacity is None:
        capacity = catalog_ds.count()
    proto = Bloom.for_capacity(capacity, fpr)
    n_bits, k = proto.n_bits, proto.k

    def _partial(batch: pa.Table) -> pa.Table:
        b = Bloom(n_bits, k)
        vals = batch.column(column).drop_null().to_numpy(zero_copy_only=False)
        b.add(vals)
        return pa.table({"bloom": pa.array([b.to_bytes()], pa.binary())})

    def _merge_block(b: pa.Table) -> pa.Table:
        m = Bloom(n_bits, k)
        for blob in b.column("bloom").to_pylist():
            m.merge(Bloom.from_bytes(blob))
        return pa.table({"bloom": pa.array([m.to_bytes()], pa.binary())})

    parts = catalog_ds.map_batches(
        _partial, batch_format="pyarrow", batch_size=batch_size)
    final = tree_reduce(parts, _merge_block)
    merged = Bloom(n_bits, k)
    for row in final.iter_rows():
        merged.merge(Bloom.from_bytes(row["bloom"]))
    return merged


def build_exact_set(catalog_ds, column: str = "media_ref") -> set:
    return set(r[column] for r in
               catalog_ds.select_columns([column]).iter_rows())


def count_dangling_fk(fact_ds, dim_ds, *, fk: str, pk: str,
                      batch_size: int = 65536, concurrency=None,
                      broadcast_limit: int = 2_000_000):
    """Generic FK check: count of fact rows whose ``fk`` is not a ``pk`` of
    the dimension table.

    Small dimensions (< ``broadcast_limit`` keys) take the broadcast path:
    the distinct key array ships ONCE via ``ray.put`` and each batch runs a
    vectorized ``np.isin`` membership test, emitting one partial count.
    Larger dimensions are routed automatically to the exact distributed
    anti-join (``dangling_fk_rows``) — shuffling distinct keys instead of
    broadcasting an unbounded set to every task.
    """
    import ray

    n_dim = dim_ds.count()
    if n_dim > broadcast_limit:
        rows = dangling_fk_rows(fact_ds, dim_ds, fk=fk, pk=pk,
                                batch_size=batch_size,
                                concurrency=concurrency)
        total = rows.sum("n_occurrences")
        return pa.table({"n_dangling": pa.array([int(total or 0)],
                                                pa.int64())})

    keys_df = dim_ds.select_columns([pk]).to_pandas()
    keys = np.unique(keys_df[pk].dropna().to_numpy())
    ref = ray.put(keys)

    def _partial(batch: pa.Table) -> pa.Table:
        side = ray.get(ref)
        vals = batch.column(fk).drop_null().to_numpy(zero_copy_only=False)
        n = int(len(vals) - np.isin(vals, side).sum())
        return pa.table({"dangling": pa.array([n], pa.int64())})

    partials = fact_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
    agg = partials.sum("dangling")  # scalar

    return pa.table({"n_dangling": pa.array([int(agg or 0)], pa.int64())})


def dangling_fk_rows(fact_ds, dim_ds, *, fk: str, pk: str,
                     batch_size: int = 65536, concurrency=None):
    """Exact distributed anti-join — the scale path when the dimension side
    is too large to broadcast (SURVEY §2.4 "exact verify" variant).

    Both sides collapse to distinct keys per batch (combiner), union, and a
    single groupby detects fact keys never seen on the dimension side. The
    shuffled volume is distinct keys, not rows. Returns (key, n_occurrences).
    """
    import pyarrow.compute as pc

    def _fact_partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(fk).drop_null()
        uniq, counts = np.unique(vals.to_numpy(zero_copy_only=False),
                                 return_counts=True)
        return pa.table({"key": pa.array(uniq.tolist()),
                         "occ": pa.array(counts.astype(np.int64)),
                         "in_dim": pa.array(np.zeros(len(uniq), np.int64))})

    def _dim_partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(pk).drop_null()
        uniq = np.unique(vals.to_numpy(zero_copy_only=False))
        return pa.table({"key": pa.array(uniq.tolist()),
                         "occ": pa.array(np.zeros(len(uniq), np.int64)),
                         "in_dim": pa.array(np.ones(len(uniq), np.int64))})

    from engine.shuffle import balance
    f = fact_ds.map_batches(_fact_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size,
                            concurrency=concurrency)
    d = dim_ds.map_batches(_dim_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    from ray.data.aggregate import Sum
    agg = balance(f.union(d)).groupby("key").aggregate(
        Sum("occ"), Sum("in_dim"))

    def _final(b: pa.Table) -> pa.Table:
        occ = b.column("sum(occ)")
        in_dim = b.column("sum(in_dim)")
        out = pa.table({"key": b.column("key"), "n_occurrences": occ})
        return out.filter(pc.and_(pc.equal(in_dim, 0), pc.greater(occ, 0)))

    return agg.map_batches(_final, batch_format="pyarrow")


class _RefCheckBatch:
    """Checks flattened ``<list_col>.<ref_field>`` membership against the
    broadcast filter; emits one row per dangling ref occurrence.

    With ``emit_hit_keys`` the batch ALSO emits its distinct Bloom-HIT keys
    as marker rows (span_index = -1, key_column = '') so a downstream exact
    pass can audit them without a second corpus scan (the hit-key rows are
    distinct-per-batch, a combiner output, never one row per ref)."""

    def __init__(self, side_ref, list_col: str, ref_field: str,
                 key_column: str, exact: bool, emit_hit_keys: bool = False):
        self.side_ref = side_ref  # ray.ObjectRef or the object itself
        self.list_col = list_col
        self.ref_field = ref_field
        self.key_column = key_column
        self.exact = exact
        self.emit_hit_keys = emit_hit_keys
        self._side = None

    def _get_side(self):
        if self._side is None:
            import ray
            obj = self.side_ref
            if isinstance(obj, ray.ObjectRef):
                obj = ray.get(obj)
            self._side = obj
        return self._side

    def __call__(self, batch: pa.Table) -> pa.Table:
        side = self._get_side()
        arr = _decode(batch.column(self.list_col))
        if not _is_list_t(arr.type):
            raise TypeError(f"{self.list_col} is not a list column")
        active = np.ones(len(arr), dtype=bool)
        if arr.null_count:
            active = np.asarray(pc.is_valid(arr)).astype(bool)
        elems, parent, within = _flatten(arr, active)
        refs_arr = _decode(elems.field(self.ref_field))
        refs = refs_arr.to_numpy(zero_copy_only=False)
        nonempty = np.array([r is not None and r != "" for r in refs],
                            dtype=bool)
        check = refs[nonempty]
        if self.exact:
            hit = np.array([r in side for r in check], dtype=bool)
        else:
            hit = side.contains(check.astype(object))
        dangling_local = np.nonzero(nonempty)[0][~hit]
        keys = batch.column(self.key_column).take(
            pa.array(parent[dangling_local]))
        out = pa.table({
            self.key_column: keys,
            "span_index": pa.array(within[dangling_local].astype(np.int32)),
            "media_ref": pa.array([refs[i] for i in dangling_local.tolist()],
                                  pa.string()),
        })
        if self.emit_hit_keys:
            hit_keys = np.unique(check[hit].astype(object))
            marker = pa.table({
                self.key_column: pa.array([""] * len(hit_keys), pa.string()),
                "span_index": pa.array(
                    np.full(len(hit_keys), -1, dtype=np.int32)),
                "media_ref": pa.array(hit_keys.tolist(), pa.string()),
            })
            out = pa.concat_tables([out, marker])
        return out


def check_references(docs_ds, catalog_ds, *, list_col: str = "spans",
                     ref_field: str = "media_ref",
                     key_column: str = "doc_id", exact: bool = False,
                     verify_hits: bool = False, fpr: float = 0.01,
                     batch_size: int = 8192, concurrency=None):
    """Dangling-reference Dataset: (key, span_index, media_ref).

    The side input is built once on the driver and broadcast via ``ray.put``
    (read zero-copy-ish by every task), never re-shipped per batch.

    ``verify_hits=True`` (Bloom mode only) adds the two-phase exact audit
    of Bloom HITS: at 10^12 refs and 1% fpr, ~10^10 dangling refs would
    otherwise pass silently. Phase 1 emits the definite misses and the
    per-batch distinct hit keys; phase 2 anti-joins the distinct hit keys
    against the catalog (``dangling_fk_rows`` — shuffles distinct keys,
    never rows); only when that finds false positives (rare) does a third
    targeted pass fetch their row contexts behind a broadcast of the
    (tiny) FP key set.
    """
    import ray

    side = (build_exact_set(catalog_ds, ref_field) if exact
            else build_bloom(catalog_ds, ref_field, fpr=fpr))
    side_ref = ray.put(side)
    if exact or not verify_hits:
        return docs_ds.map_batches(
            _RefCheckBatch(side_ref, list_col, ref_field, key_column, exact),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size, concurrency=concurrency)

    phase1 = docs_ds.map_batches(
        _RefCheckBatch(side_ref, list_col, ref_field, key_column, False,
                       emit_hit_keys=True),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency).materialize()

    def _miss_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        return b.filter(pc2.greater_equal(b.column("span_index"), 0))

    def _hit_keys(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        sub = b.filter(pc2.equal(b.column("span_index"), -1))
        return pa.table({"media_ref": sub.column("media_ref")})

    misses = phase1.map_batches(_miss_rows, batch_format="pyarrow")
    hits = phase1.map_batches(_hit_keys, batch_format="pyarrow")
    fp = dangling_fk_rows(hits, catalog_ds, fk="media_ref", pk=ref_field,
                          batch_size=batch_size).materialize()
    if fp.count() == 0:
        return misses

    fp_keys = set(fp.to_pandas()["key"].tolist())
    fp_ref = ray.put(fp_keys)
    fp_rows = docs_ds.map_batches(
        _FetchRefRows(fp_ref, list_col, ref_field, key_column),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
    return misses.union(fp_rows)


class _FetchRefRows:
    """Row contexts (key, span_index, media_ref) of refs IN the broadcast
    key set — the targeted third pass that materializes the (rare) Bloom
    false positives found by the exact hit audit."""

    def __init__(self, keys_ref, list_col: str, ref_field: str,
                 key_column: str):
        self.keys_ref = keys_ref
        self.list_col = list_col
        self.ref_field = ref_field
        self.key_column = key_column
        self._keys = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray
        if self._keys is None:
            obj = self.keys_ref
            self._keys = ray.get(obj) if isinstance(
                obj, ray.ObjectRef) else obj
        arr = _decode(batch.column(self.list_col))
        active = np.ones(len(arr), dtype=bool)
        if arr.null_count:
            active = np.asarray(pc.is_valid(arr)).astype(bool)
        elems, parent, within = _flatten(arr, active)
        refs = _decode(elems.field(self.ref_field)).to_numpy(
            zero_copy_only=False)
        sel = np.array([r is not None and r in self._keys for r in refs],
                       dtype=bool)
        idx = np.nonzero(sel)[0]
        keys = batch.column(self.key_column).take(pa.array(parent[idx]))
        return pa.table({
            self.key_column: keys,
            "span_index": pa.array(within[idx].astype(np.int32)),
            "media_ref": pa.array([refs[i] for i in idx.tolist()],
                                  pa.string()),
        })
