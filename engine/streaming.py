"""Micro-batch streaming: tumbling event-time windows with watermarks.

The reference engine is batch-only; a large-scale training-data pipeline
additionally needs incremental/windowed processing of an APPEND-ONLY event
stream. The Ray-Data-native shape for that is micro-batch execution
(Structured-Streaming style): each call processes one new slice of events as
a normal distributed Dataset pipeline, while WINDOW STATE — the only thing
that must survive between calls — lives in a parquet state store:

* aggregation of the new slice is the standard partial+final pattern
  (combiner inside ``map_batches``, small groupby after) — fully
  distributed, nothing driver-side except the bounded state metadata;
* open-window state is bounded by (active keys x open windows per key),
  orders of magnitude below the event volume, so persisting it per
  micro-batch is cheap and makes the operator RESUMABLE: a killed run
  re-processes only its current micro-batch (at-least-once per batch,
  exactly-once per committed state version);
* the event-time watermark is ``max(event ts seen) - allowed_lateness``.
  A new event older than the CURRENT watermark is late: counted and
  excluded (the window it belongs to may already have been emitted).
  Windows whose end <= watermark close and are emitted, never to change.

Partitioning assumption: none beyond the groupby — events of one key do NOT
need to be co-located or ordered within a micro-batch; the state merge is
associative. Wall-clock ordering ACROSS micro-batches is the caller's
stream order, as in any micro-batch system.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_STATE_SCHEMA = None  # built per key dtype


def _parse_duration_s(v) -> int:
    if isinstance(v, (int, float)):
        return int(v)
    units = {"s": 1, "m": 60, "h": 3600, "d": 86400}
    return int(float(v[:-1]) * units[v[-1]])


class WindowState:
    """Open-window state + watermark, persisted under ``state_dir``.

    ``open_windows.parquet``: (key, window_start_us, n_events, value_sum)
    ``meta.json``: watermark_us, version, totals. Writes go to a temp file
    then rename — the rename is the commit point (same idempotent-overwrite
    discipline as engine/checkpoint.py).
    """

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.meta_path = os.path.join(state_dir, "meta.json")
        self.open_path = os.path.join(state_dir, "open_windows.parquet")

    def load_meta(self) -> dict:
        if os.path.exists(self.meta_path):
            return json.load(open(self.meta_path))
        return {"watermark_us": None, "version": 0, "late_events": 0,
                "closed_windows": 0}

    def load_open(self) -> Optional[pa.Table]:
        if os.path.exists(self.open_path):
            return pq.read_table(self.open_path)
        return None

    def commit(self, meta: dict, open_tbl: pa.Table) -> None:
        tmp = self.open_path + ".tmp"
        pq.write_table(open_tbl, tmp)
        os.replace(tmp, self.open_path)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)


def process_micro_batch(events_ds, state_dir: str, *,
                        key_col: str = "user_id", ts_col: str = "ts",
                        value_col: str = "value", window: str = "1h",
                        allowed_lateness: str = "30m",
                        batch_size: int = 65536, concurrency=None):
    """Process one micro-batch of events; returns
    ``(closed_windows: pa.Table, summary: dict)``.

    closed_windows columns: (key, window_start, n_events, value_sum) —
    windows finalized by this batch, emitted exactly once across the
    stream's lifetime. Open windows + watermark persist in ``state_dir``.
    """
    win_us = _parse_duration_s(window) * 1_000_000
    late_us = _parse_duration_s(allowed_lateness) * 1_000_000
    state = WindowState(state_dir)
    meta = state.load_meta()
    wm = meta["watermark_us"]  # None before any event

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        if len(batch) == 0:
            kt = batch.schema.field(key_col).type
            return pa.table({
                "key": pa.array([], kt),
                "wstart": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "value_sum": pa.array([], pa.float64()),
                "late": pa.array([], pa.int64()),
                "max_ts": pa.array([], pa.int64())})
        ts = pc.cast(batch.column(ts_col), pa.timestamp("us"))
        ts_us = ts.to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        on_time = np.ones(len(batch), dtype=bool) if wm is None \
            else ts_us >= wm
        wstart = (ts_us // win_us) * win_us
        df = pd.DataFrame({
            "key": batch.column(key_col).to_numpy(zero_copy_only=False),
            "wstart": wstart, "on_time": on_time,
            "value": pc.cast(batch.column(value_col),
                             pa.float64()).to_numpy(zero_copy_only=False),
        })
        sub = df[df["on_time"]]
        g = sub.groupby(["key", "wstart"], sort=False).agg(
            n_events=("value", "size"),
            value_sum=("value", "sum")).reset_index()
        g["late"] = np.int64(0)
        g["max_ts"] = np.int64(0)
        row = pd.DataFrame([{
            "key": df["key"].iloc[0] if len(df) else 0,
            "wstart": np.int64(-1), "n_events": np.int64(0),
            "value_sum": 0.0,
            "late": np.int64((~df["on_time"]).sum()),
            "max_ts": np.int64(ts_us.max()) if len(ts_us) else np.int64(0),
        }])
        out = pd.concat([g, row], ignore_index=True)
        out["n_events"] = out["n_events"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from engine.shuffle import balance
    from ray.data.aggregate import Max, Sum
    partials = balance(events_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency))
    agg = partials.groupby(["key", "wstart"]).aggregate(
        Sum("n_events"), Sum("value_sum"), Sum("late"), Max("max_ts"))
    # window state is bounded (active keys x open windows), so materializing
    # the merged aggregate IS the design — it becomes the persisted state
    merged = agg.to_arrow_refs()
    import ray
    parts = [t for t in (ray.get(r) for r in merged) if t.num_columns]
    if parts:
        tbl = pa.concat_tables(parts)
    else:  # empty micro-batch
        kt = events_ds.schema().base_schema.field(key_col).type
        tbl = pa.table({
            "key": pa.array([], kt),
            "wstart": pa.array([], pa.int64()),
            "sum(n_events)": pa.array([], pa.int64()),
            "sum(value_sum)": pa.array([], pa.float64()),
            "sum(late)": pa.array([], pa.int64()),
            "max(max_ts)": pa.array([], pa.int64())})

    wstart = tbl.column("wstart").to_numpy(zero_copy_only=False)
    meta_rows = wstart == -1
    n_late = int(pa.compute.sum(
        tbl.column("sum(late)")).as_py() or 0)
    max_ts = int(pa.compute.max(
        tbl.column("max(max_ts)")).as_py() or 0)
    data = tbl.filter(pa.array(~meta_rows))

    new_rows = pa.table({
        "key": data.column("key"),
        "wstart": data.column("wstart"),
        "n_events": data.column("sum(n_events)"),
        "value_sum": data.column("sum(value_sum)"),
    })
    prev = state.load_open()
    combined = pa.concat_tables([prev, new_rows]) if prev is not None \
        else new_rows
    if len(combined):
        import pandas as pd
        df = combined.to_pandas()
        df = df.groupby(["key", "wstart"], sort=True).agg(
            n_events=("n_events", "sum"),
            value_sum=("value_sum", "sum")).reset_index()
        combined = pa.Table.from_pandas(df, preserve_index=False)

    new_wm = max_ts - late_us if max_ts else (wm if wm is not None else None)
    if wm is not None and (new_wm is None or new_wm < wm):
        new_wm = wm  # watermark never regresses

    ws = combined.column("wstart").to_numpy(zero_copy_only=False) \
        if len(combined) else np.zeros(0, np.int64)
    close_mask = np.zeros(len(combined), dtype=bool) if new_wm is None \
        else (ws + win_us) <= new_wm
    closed = combined.filter(pa.array(close_mask))
    still_open = combined.filter(pa.array(~close_mask))

    meta = {
        "watermark_us": new_wm,
        "version": meta["version"] + 1,
        "late_events": meta["late_events"] + n_late,
        "closed_windows": meta["closed_windows"] + len(closed),
    }
    state.commit(meta, still_open)

    closed_out = pa.table({
        "key": closed.column("key"),
        "window_start": pc.cast(closed.column("wstart"),
                                pa.timestamp("us")),
        "n_events": closed.column("n_events"),
        "value_sum": closed.column("value_sum"),
    })
    return closed_out, {"late_events": n_late,
                        "watermark_us": new_wm,
                        "open_windows": len(still_open),
                        "closed_windows": len(closed)}


def flush(state_dir: str) -> pa.Table:
    """End-of-stream: close every remaining open window and clear state."""
    state = WindowState(state_dir)
    open_tbl = state.load_open()
    meta = state.load_meta()
    if open_tbl is None:
        open_tbl = pa.table({"key": pa.array([], pa.int64()),
                             "wstart": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "value_sum": pa.array([], pa.float64())})
    meta["closed_windows"] += len(open_tbl)
    state.commit(meta, open_tbl.slice(0, 0))
    return pa.table({
        "key": open_tbl.column("key"),
        "window_start": pc.cast(open_tbl.column("wstart"),
                                pa.timestamp("us")),
        "n_events": open_tbl.column("n_events"),
        "value_sum": open_tbl.column("value_sum"),
    })


# ---------------------------------------------------------------------------
# micro-batch streaming exact dedup


class DedupState:
    """Seen-content state for streaming dedup: versioned parquet hash files
    plus a serialized Bloom, committed by meta rename (same idempotent
    contract as WindowState — a killed run re-processes only its current
    micro-batch, and re-committing version N is an overwrite, not a
    duplicate)."""

    def __init__(self, state_dir: str):
        self.dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self.meta_path = os.path.join(state_dir, "dedup_meta.json")

    def load_meta(self) -> dict:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return json.load(f)
        return {"version": 0, "n_hashes": 0, "bloom": None,
                "last_batch_id": None}

    def hash_files(self, meta: dict) -> list:
        return [os.path.join(self.dir, f"hashes_v{i}.parquet")
                for i in range(1, meta["version"] + 1)
                if os.path.exists(os.path.join(self.dir,
                                               f"hashes_v{i}.parquet"))]

    def load_bloom(self, meta: dict):
        from engine.sketches import Bloom
        if not meta["bloom"]:
            return None
        b = np.load(os.path.join(self.dir, meta["bloom"]))
        return Bloom(int(b["n_bits"]), int(b["k"]), bits=b["words"])

    def commit(self, meta: dict, new_hashes: pa.Table, bloom,
               batch_id=None) -> None:
        v = meta["version"] + 1
        tmp = os.path.join(self.dir, f"hashes_v{v}.parquet.tmp")
        pq.write_table(new_hashes, tmp)
        os.replace(tmp, os.path.join(self.dir, f"hashes_v{v}.parquet"))
        bname = f"bloom_v{v}.npz"
        tmpb = os.path.join(self.dir, bname + ".tmp")
        with open(tmpb, "wb") as f:
            np.savez(f, n_bits=bloom.n_bits, k=bloom.k, words=bloom.words)
        os.replace(tmpb, os.path.join(self.dir, bname))
        meta = dict(meta, version=v, bloom=bname,
                    n_hashes=meta["n_hashes"] + len(new_hashes),
                    last_batch_id=batch_id)
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self.meta_path)


def stream_dedup_micro_batch(docs_ds, state_dir: str, *,
                             text_col: str = "text",
                             key_col: str = "doc_id",
                             batch_id=None,
                             expected_total: int = 1_000_000,
                             batch_size: int = 65536):
    """Process one micro-batch of an append-only document stream; returns
    ``(kept: pa.Table (key, text_hash), summary: dict)`` — the documents
    whose content was never seen in ANY earlier committed micro-batch
    (within a batch, the minimum key per content survives).

    Scale shape: in-batch md5+min-key combiner -> coarse-partition per-hash
    min (only distinct (hash, key) rows shuffle); the seen-state check is
    two-phase like the referential checks — a broadcast Bloom rejects
    definitely-new hashes map-only, and only Bloom HITS anti-join the
    state's hash files (sparse; a false positive costs one joined row,
    never a wrongly dropped document). State grows O(distinct content);
    hash files are append-only parquet versions, so the exact pass reads
    hashes, not documents.
    """
    import pandas as pd
    import ray
    import ray.data
    from engine.dedup import _md5_hex
    from engine.sketches import Bloom, hash64
    from engine.shuffle import reduce_blocks

    state = DedupState(state_dir)
    meta = state.load_meta()
    if batch_id is not None and meta.get("last_batch_id") == batch_id:
        # replayed delivery of an already-committed batch: re-emit its
        # recorded keeps, change nothing (exactly-once per batch id)
        t = pq.read_table(os.path.join(
            state.dir, f"hashes_v{meta['version']}.parquet"))
        out = pa.table({key_col: t.column("key"),
                        "text_hash": t.column("h")})
        return out, {"batch_docs_kept": len(t), "bloom_hits": 0,
                     "false_positives_recovered": 0,
                     "version": meta["version"], "replayed": True}
    bloom = state.load_bloom(meta)
    P = reduce_blocks()

    def _partial(df):
        if text_col not in df.columns or not len(df):
            return pd.DataFrame({"h": [], "key": [], "part": []})
        h = np.array(_md5_hex(df[text_col].fillna("").tolist()),
                     dtype=object)
        sub = pd.DataFrame({"h": h, "key": df[key_col].to_numpy()})
        sub = sub.groupby("h", as_index=False)["key"].min()
        sub["part"] = (hash64(sub["h"].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return sub

    def _min_per_hash(df):
        if "h" not in df.columns or not len(df):
            return pd.DataFrame({"h": [], "key": []})
        return df.groupby("h", as_index=False)["key"].min()

    cand = docs_ds.map_batches(_partial, batch_format="pandas",
                               batch_size=batch_size) \
        .groupby("part").map_groups(_min_per_hash, batch_format="pandas") \
        .to_pandas()

    if bloom is None or not len(cand):
        hits = np.zeros(len(cand), dtype=bool)
    else:
        hits = bloom.contains(cand["h"].to_numpy())
    kept = cand[~hits]
    suspect = cand[hits]
    files = state.hash_files(meta)
    if len(suspect) and files:
        # exact pass: the state scans DISTRIBUTEDLY, filtered against the
        # broadcast sparse suspect set — the driver only ever holds
        # suspect-sized data, never the full seen-hash set
        suspect_sorted = np.sort(suspect["h"].to_numpy())
        ref = ray.put(suspect_sorted)

        class _AmongSuspects:
            def __init__(self, r):
                self.r = r
                self._s = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if self._s is None:
                    self._s = ray.get(self.r) if isinstance(
                        self.r, ray.ObjectRef) else self.r
                v = b.column("h").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(self._s, v)
                pos = np.clip(pos, 0, len(self._s) - 1)
                return b.filter(pa.array(self._s[pos] == v))

        seen_sparse = ray.data.read_parquet(files).map_batches(
            _AmongSuspects(ref), batch_format="pyarrow").to_pandas()
        seen_set = set(seen_sparse["h"]) if len(seen_sparse) else set()
        fp = suspect[~suspect["h"].isin(seen_set)]
        kept = pd.concat([kept, fp], ignore_index=True)

    kept = kept.sort_values("key").reset_index(drop=True)
    new_hashes = pa.table({"h": pa.array(kept["h"].tolist(), pa.string()),
                           "key": pa.array(kept["key"].tolist())})
    if bloom is None:
        bloom = Bloom.for_capacity(max(expected_total, 1), 0.01)
    if len(kept):
        bloom.add(kept["h"].to_numpy())
    state.commit(meta, new_hashes, bloom, batch_id=batch_id)
    out = pa.table({key_col: pa.array(kept["key"].tolist()),
                    "text_hash": pa.array(kept["h"].tolist(), pa.string())})
    summary = {"batch_docs_kept": len(kept),
               "bloom_hits": int(hits.sum()),
               "false_positives_recovered": int(len(kept) - (~hits).sum()),
               "version": meta["version"] + 1}
    return out, summary
