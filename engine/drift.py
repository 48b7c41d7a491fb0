"""Distribution drift: per-partition KS (numeric) / PSI (categorical) against
a baseline sketch store.

Baseline = merged t-digests (numeric) + value counts (categorical) from a
reference corpus, built with the same partial+final pattern as stats. The
per-partition check sketches each partition (partials inside ``map_batches``,
merged per (partition, column) in a small groupby) and compares against the
broadcast baseline — the corpus is never shuffled.

* KS distance: max |ECDF_part(x) - ECDF_base(x)| evaluated on the union of
  centroid locations of both digests.
* PSI: sum (p-q) ln(p/q) over categories with add-one smoothing.
"""

from __future__ import annotations

import json
from typing import Sequence

import numpy as np
import pyarrow as pa

from engine.sketches import TDigest

NUMERIC_DEFAULT = ("spans.offset", "spans.__len")
CATEGORICAL_DEFAULT = ("spans.kind",)

_PARTIAL_SCHEMA = pa.schema([
    ("partition_id", pa.string()),
    ("column", pa.string()),
    ("kind", pa.string()),          # "numeric" | "categorical"
    ("tdigest", pa.binary()),
    ("counts", pa.string()),        # JSON {value: count}
])


class _DriftPartialBatch:
    def __init__(self, numeric: Sequence[str], categorical: Sequence[str]):
        self.numeric = tuple(numeric)
        self.categorical = tuple(categorical)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "partition_id" in batch.column_names:
            parts = batch.column("partition_id").to_numpy(
                zero_copy_only=False)
        else:  # unpartitioned corpus: one logical partition
            parts = np.full(len(batch), "all", dtype=object)
        rows = []
        wanted = set(self.numeric) | set(self.categorical)
        # map each leaf column's slots back to batch rows
        from engine.kernels import _decode, _flatten, _is_list_t
        for name in wanted:
            if name in batch.column_names:
                arr = _decode(batch.column(name))
                parent = np.arange(len(batch))
            else:
                base, _, field = name.partition(".")
                if base not in batch.column_names:
                    continue
                lst = _decode(batch.column(base))
                if not _is_list_t(lst.type):
                    continue
                active = np.ones(len(lst), dtype=bool)
                if lst.null_count:
                    active = np.asarray(pc.is_valid(lst)).astype(bool)
                if field == "__len":
                    arr = pc.list_value_length(lst)
                    arr = pc.fill_null(arr, 0)
                    parent = np.arange(len(batch))
                else:
                    elems, parent, _ = _flatten(lst, active)
                    arr = _decode(elems.field(field))
            vals = arr.to_numpy(zero_copy_only=False)
            pvals = parts[parent]
            for p in np.unique(pvals):
                sel = vals[pvals == p]
                if name in self.numeric:
                    sel = sel[~(sel == None)]  # noqa: E711
                    td = TDigest().update(np.asarray(sel, dtype=np.float64))
                    rows.append({"partition_id": str(p), "column": name,
                                 "kind": "numeric", "tdigest": td.to_bytes(),
                                 "counts": ""})
                else:
                    u, c = np.unique(sel[sel != None], return_counts=True)  # noqa: E711
                    rows.append({"partition_id": str(p), "column": name,
                                 "kind": "categorical", "tdigest": b"",
                                 "counts": json.dumps(
                                     {str(k): int(v) for k, v in zip(u, c)})})
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


def _merge_partials(df):
    """Merge partial rows of one (partition, column) group -> one row."""
    import pandas as pd

    kind = df["kind"].iloc[0]
    if kind == "numeric":
        td = TDigest()
        for b in df["tdigest"]:
            if b:
                td.merge(TDigest.from_bytes(bytes(b)))
        blob, counts = td.to_bytes(), ""
    else:
        total: dict = {}
        for s in df["counts"]:
            if s:
                for k, v in json.loads(s).items():
                    total[k] = total.get(k, 0) + v
        blob, counts = b"", json.dumps(total)
    return pd.DataFrame([{
        "partition_id": df["partition_id"].iloc[0],
        "column": df["column"].iloc[0],
        "kind": kind, "tdigest": blob, "counts": counts,
    }])


def build_baseline(ds, *, numeric: Sequence[str] = NUMERIC_DEFAULT,
                   categorical: Sequence[str] = CATEGORICAL_DEFAULT,
                   exclude_partitions: Sequence[str] = (),
                   batch_size: int = 8192) -> dict:
    """Baseline sketch store {column: (kind, payload)} from a clean corpus.

    Partial sketches are tree-reduced per column (engine/shuffle.py
    tree_reduce) so the driver merges O(columns x cluster) rows, never one
    sketch row per batch; excluded partitions are filtered before any
    merging.
    """
    import pyarrow.compute as pc

    from engine.shuffle import tree_reduce

    partials = ds.map_batches(
        _DriftPartialBatch(numeric, categorical),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    excl = set(exclude_partitions)
    if excl:
        excl_arr = pa.array(sorted(excl), pa.string())

        def _drop_excluded(b: pa.Table) -> pa.Table:
            keep = pc.invert(pc.is_in(b.column("partition_id"),
                                      value_set=excl_arr))
            return b.filter(keep)

        partials = partials.map_batches(_drop_excluded,
                                        batch_format="pyarrow")

    def _merge_block(b: pa.Table) -> pa.Table:
        """One merged row per (column, kind) present in the block; the
        partition_id collapses to the merged marker '' (partition identity
        is only meaningful pre-filter)."""
        out = []
        cols = b.column("column").to_pylist()
        kinds = b.column("kind").to_pylist()
        tds = b.column("tdigest").to_pylist()
        cnts = b.column("counts").to_pylist()
        acc: dict = {}
        for col, kind, td, cn in zip(cols, kinds, tds, cnts):
            if kind == "numeric":
                cur = acc.setdefault((col, kind), TDigest())
                if td:
                    cur.merge(TDigest.from_bytes(bytes(td)))
            else:
                cur = acc.setdefault((col, kind), {})
                if cn:
                    for kk, vv in json.loads(cn).items():
                        cur[kk] = cur.get(kk, 0) + vv
        for (col, kind), payload in sorted(acc.items()):
            out.append({
                "partition_id": "", "column": col, "kind": kind,
                "tdigest": payload.to_bytes() if kind == "numeric" else b"",
                "counts": json.dumps(payload) if kind != "numeric" else "",
            })
        return pa.Table.from_pylist(out, schema=_PARTIAL_SCHEMA)

    final = tree_reduce(partials, _merge_block)
    baseline: dict = {}
    for row in final.iter_rows():
        col = row["column"]
        if row["kind"] == "numeric":
            td = TDigest.from_bytes(bytes(row["tdigest"]))
            if col in baseline:
                baseline[col][1].merge(td)
            else:
                baseline[col] = ("numeric", td)
        else:
            cnts = json.loads(row["counts"]) if row["counts"] else {}
            if col in baseline:
                for k, v in cnts.items():
                    baseline[col][1][k] = baseline[col][1].get(k, 0) + v
            else:
                baseline[col] = ("categorical", dict(cnts))
    return baseline


def ks_distance(a: TDigest, b: TDigest) -> float:
    xs = np.unique(np.concatenate([a.means, b.means]))
    if len(xs) == 0:
        return 0.0
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))


def psi(p_counts: dict, q_counts: dict) -> float:
    cats = sorted(set(p_counts) | set(q_counts))
    if not cats:
        return 0.0
    p = np.array([p_counts.get(c, 0) + 1.0 for c in cats])
    q = np.array([q_counts.get(c, 0) + 1.0 for c in cats])
    p /= p.sum()
    q /= q.sum()
    return float(np.sum((p - q) * np.log(p / q)))


def drift_check(ds, baseline: dict, *,
                numeric: Sequence[str] = NUMERIC_DEFAULT,
                categorical: Sequence[str] = CATEGORICAL_DEFAULT,
                ks_threshold: float = 0.15, psi_threshold: float = 0.2,
                batch_size: int = 8192):
    """Per (partition, column) drift verdicts vs the broadcast baseline."""
    partials = ds.map_batches(
        _DriftPartialBatch(numeric, categorical),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    merged = partials.groupby(["partition_id", "column"]).map_groups(
        _merge_partials, batch_format="pandas")

    base_ser = {k: (kind, td.to_bytes() if kind == "numeric" else td)
                for k, (kind, td) in baseline.items()}

    def _score(df):
        import pandas as pd
        out = []
        for _, r in df.iterrows():
            entry = base_ser.get(r["column"])
            if entry is None:
                continue
            kind, payload = entry
            if kind == "numeric":
                d = ks_distance(TDigest.from_bytes(bytes(r["tdigest"])),
                                TDigest.from_bytes(payload))
                out.append({"partition_id": r["partition_id"],
                            "column": r["column"], "metric": "ks",
                            "value": d, "drifted": d > ks_threshold})
            else:
                cnts = json.loads(r["counts"]) if r["counts"] else {}
                d = psi(cnts, payload)
                out.append({"partition_id": r["partition_id"],
                            "column": r["column"], "metric": "psi",
                            "value": d, "drifted": d > psi_threshold})
        return pd.DataFrame(out, columns=["partition_id", "column", "metric",
                                          "value", "drifted"])

    return merged.map_batches(_score, batch_format="pandas")


# ---------------------------------------------------------------------------
# incremental drift over streaming micro-batches


def save_baseline(baseline: dict, path: str) -> None:
    """Serialize a baseline sketch store to one parquet file (atomic
    rename commit, same discipline as engine/streaming.py state)."""
    import os

    import pyarrow.parquet as pq
    rows = []
    for col, (kind, payload) in sorted(baseline.items()):
        rows.append({
            "column": col, "kind": kind,
            "tdigest": payload.to_bytes() if kind == "numeric" else b"",
            "counts": json.dumps(payload) if kind == "categorical" else "",
        })
    tbl = pa.Table.from_pylist(rows, schema=pa.schema([
        ("column", pa.string()), ("kind", pa.string()),
        ("tdigest", pa.binary()), ("counts", pa.string())]))
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def load_baseline(path: str) -> dict:
    import pyarrow.parquet as pq
    tbl = pq.read_table(path)
    out: dict = {}
    for row in tbl.to_pylist():
        if row["kind"] == "numeric":
            out[row["column"]] = ("numeric",
                                  TDigest.from_bytes(bytes(row["tdigest"])))
        else:
            out[row["column"]] = ("categorical",
                                  json.loads(row["counts"] or "{}"))
    return out


def drift_micro_batch(ds, state_dir: str, *,
                      numeric: Sequence[str] = NUMERIC_DEFAULT,
                      categorical: Sequence[str] = CATEGORICAL_DEFAULT,
                      ks_threshold: float = 0.15,
                      psi_threshold: float = 0.2,
                      update_baseline: str = "if_clean",
                      batch_size: int = 8192):
    """Incremental drift: check one micro-batch against the persistent
    baseline sketch store under ``state_dir``; returns (verdicts, summary).

    * first micro-batch seeds the baseline (no verdicts);
    * ``update_baseline``: "if_clean" merges the batch's sketches into the
      baseline only when NO column drifted (a drifting batch must not
      poison the reference distribution), "always" merges regardless,
      "never" keeps the original baseline frozen;
    * sketches are mergeable (t-digest / counts), so the baseline grows
      without ever re-reading history — the streaming analog of
      ``build_baseline``. State commits are atomic renames.
    """
    import os

    bpath = os.path.join(state_dir, "drift_baseline.parquet")
    mpath = os.path.join(state_dir, "drift_meta.json")
    os.makedirs(state_dir, exist_ok=True)

    # one-partition sketch of this micro-batch (distributed partial pass)
    partials = ds.map_batches(
        _DriftPartialBatch(numeric, categorical),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    batch_sketch: dict = {}
    for row in partials.iter_rows():
        col = row["column"]
        if row["kind"] == "numeric":
            td = TDigest.from_bytes(bytes(row["tdigest"]))
            if col in batch_sketch:
                batch_sketch[col][1].merge(td)
            else:
                batch_sketch[col] = ("numeric", td)
        else:
            cnts = json.loads(row["counts"]) if row["counts"] else {}
            if col in batch_sketch:
                for k, v in cnts.items():
                    batch_sketch[col][1][k] = \
                        batch_sketch[col][1].get(k, 0) + v
            else:
                batch_sketch[col] = ("categorical", dict(cnts))

    meta = json.load(open(mpath)) if os.path.exists(mpath) else \
        {"version": 0, "drifted_batches": 0}

    if not os.path.exists(bpath):  # seed
        save_baseline(batch_sketch, bpath)
        meta["version"] += 1
        with open(mpath + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(mpath + ".tmp", mpath)
        empty = pa.table({
            "column": pa.array([], pa.string()),
            "metric": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "drifted": pa.array([], pa.bool_())})
        return empty, {"seeded": True, "version": meta["version"],
                       "drifted_columns": 0}

    baseline = load_baseline(bpath)
    rows = []
    for col, (kind, payload) in sorted(batch_sketch.items()):
        entry = baseline.get(col)
        if entry is None:
            continue
        if kind == "numeric":
            d = ks_distance(payload, entry[1])
            rows.append({"column": col, "metric": "ks", "value": d,
                        "drifted": d > ks_threshold})
        else:
            d = psi(payload, entry[1])
            rows.append({"column": col, "metric": "psi", "value": d,
                        "drifted": d > psi_threshold})
    verdicts = pa.Table.from_pylist(rows, schema=pa.schema([
        ("column", pa.string()), ("metric", pa.string()),
        ("value", pa.float64()), ("drifted", pa.bool_())]))
    n_drifted = sum(1 for r in rows if r["drifted"])

    if update_baseline == "always" or (
            update_baseline == "if_clean" and n_drifted == 0):
        for col, (kind, payload) in batch_sketch.items():
            entry = baseline.get(col)
            if entry is None:
                baseline[col] = (kind, payload)
            elif kind == "numeric":
                entry[1].merge(payload)
            else:
                for k, v in payload.items():
                    entry[1][k] = entry[1].get(k, 0) + v
        save_baseline(baseline, bpath)

    meta["version"] += 1
    meta["drifted_batches"] += int(n_drifted > 0)
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return verdicts, {"seeded": False, "version": meta["version"],
                      "drifted_columns": n_drifted}
