"""Per-column statistics: null rate, count, min/max, HLL distinct, t-digest.

Partial+final pattern (SURVEY.md §2.4): every ``map_batches`` task emits ONE
tiny partial row per (column x batch) — counts, typed min/max, serialized
sketches — and the final merge is a ``groupby("column").map_groups`` over
those partials only. The corpus itself is never shuffled; at 10^12 docs the
shuffled volume is (#batches x #columns) sketch blobs.

Nested span fields are flattened with the same list-offset machinery as the
validator, so stats cover ``spans.kind`` etc. as first-class columns.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.kernels import (_decode, _flatten, _is_float_t, _is_int_t,
                            _is_list_t, _is_string_t)
from engine.sketches import HLL, TDigest

PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("min_num", pa.float64()),
    ("max_num", pa.float64()),
    ("min_str", pa.string()),
    ("max_str", pa.string()),
    ("hll", pa.binary()),
    ("tdigest", pa.binary()),
])

FINAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("nulls", pa.int64()),
    ("null_rate", pa.float64()),
    ("distinct_est", pa.float64()),
    ("min", pa.string()),
    ("max", pa.string()),
    ("p50", pa.float64()),
    ("p95", pa.float64()),
    ("p99", pa.float64()),
])


def _leaf_columns(batch: pa.Table) -> list[tuple[str, pa.Array]]:
    """Top-level columns plus one flattening level of list<struct> columns."""
    out = []
    for name in batch.column_names:
        arr = _decode(batch.column(name))
        t = arr.type
        if _is_list_t(t) and pa.types.is_struct(t.value_type):
            active = np.ones(len(arr), dtype=bool)
            if arr.null_count:
                active = np.asarray(pc.is_valid(arr))
            elems, _, _ = _flatten(arr, active)
            out.append((name + ".__len", pa.array(
                pc.list_value_length(arr).to_numpy(zero_copy_only=False)
                if arr.null_count == 0 else
                pc.fill_null(pc.list_value_length(arr), 0).to_numpy(
                    zero_copy_only=False))))
            for f in elems.type:
                out.append((f"{name}.{f.name}", _decode(elems.field(f.name))))
        else:
            out.append((name, arr))
    return out


class ColumnStatsBatch:
    """Partial-aggregate stage: batch -> one row per column."""

    def __init__(self, columns: Optional[Sequence[str]] = None,
                 hll_p: int = 12, tdigest_delta: int = 100):
        self.columns = set(columns) if columns else None
        self.hll_p = hll_p
        self.delta = tdigest_delta

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for name, arr in _leaf_columns(batch):
            if self.columns is not None and name not in self.columns:
                continue
            n = len(arr)
            nulls = arr.null_count
            t = arr.type
            row = {"column": name, "count": n, "nulls": nulls,
                   "min_num": None, "max_num": None,
                   "min_str": None, "max_str": None,
                   "hll": b"", "tdigest": b""}
            if n > nulls and (_is_int_t(t) or _is_float_t(t)
                              or _is_string_t(t) or pa.types.is_boolean(t)):
                mm = pc.min_max(arr)
                if _is_string_t(t):
                    row["min_str"] = mm["min"].as_py()
                    row["max_str"] = mm["max"].as_py()
                    vals = arr.drop_null().to_numpy(zero_copy_only=False)
                else:
                    row["min_num"] = float(mm["min"].as_py())
                    row["max_num"] = float(mm["max"].as_py())
                    # HLL must hash native values (a float64 cast collapses
                    # int64 ids beyond 2^53); t-digest alone takes the cast
                    vals = arr.drop_null().to_numpy(zero_copy_only=False)
                    fvals = pc.cast(arr.drop_null(), pa.float64(),
                                    safe=False).to_numpy(
                        zero_copy_only=False)
                    row["tdigest"] = TDigest(self.delta).update(
                        fvals).to_bytes()
                row["hll"] = HLL(self.hll_p).update(vals).to_bytes()
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=PARTIAL_SCHEMA)


def _merge_stats_group(df) -> "object":
    import pandas as pd

    col = df["column"].iloc[0]
    count = int(df["count"].sum())
    nulls = int(df["nulls"].sum())
    hll = None
    td = None
    for b in df["hll"]:
        if b:
            s = HLL.from_bytes(bytes(b))
            hll = s if hll is None else hll.merge(s)
    for b in df["tdigest"]:
        if b:
            s = TDigest.from_bytes(bytes(b))
            td = s if td is None else td.merge(s)
    min_num = df["min_num"].dropna()
    max_num = df["max_num"].dropna()
    min_str = df["min_str"].dropna()
    max_str = df["max_str"].dropna()
    if len(min_num):
        mn, mx = str(min_num.min()), str(max_num.max())
    elif len(min_str):
        mn, mx = str(min_str.min()), str(max_str.max())
    else:
        mn = mx = None
    return pd.DataFrame([{
        "column": col, "count": count, "nulls": nulls,
        "null_rate": nulls / count if count else 0.0,
        "distinct_est": hll.estimate() if hll else 0.0,
        "min": mn, "max": mx,
        "p50": td.quantile(0.5) if td else float("nan"),
        "p95": td.quantile(0.95) if td else float("nan"),
        "p99": td.quantile(0.99) if td else float("nan"),
    }])


def column_stats(ds, columns: Optional[Sequence[str]] = None, *,
                 batch_size: int = 8192, concurrency=None):
    """Dataset -> small stats Dataset (one row per column)."""
    partials = ds.map_batches(
        ColumnStatsBatch(columns), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=batch_size, concurrency=concurrency)
    return partials.groupby("column").map_groups(
        _merge_stats_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact distributed quantiles (selection, not sketch)


def exact_quantiles(ds, col: str, qs: Sequence[float], *,
                    sample_per_block: int = 128, n_candidates: int = 1024,
                    bracket_limit: int = 2_000_000, max_refine: int = 4,
                    batch_size=None):
    """EXACT ``quantile_cont``-style quantiles of a numeric column — a
    distributed selection algorithm, not a sketch (`column_stats` already
    provides t-digest approximations; this is the bit-exact path an oracle
    or an SLA check needs).

    Three map-only passes, none of which shuffles the corpus:

    1. per-BLOCK (count, evenly-spaced sorted sample) partials
       (``batch_size=None`` -> one zero-copy batch per block), tree-merged
       (engine/shuffle.tree_reduce) into <= ``n_candidates`` candidate
       pivots — driver traffic is O(actors), never O(batches);
    2. one vectorized rank-count pass: each BLOCK emits the
       ``count(x < c)`` / ``count(x <= c)`` vectors against the broadcast
       candidates (two np.searchsorted calls per block), tree-summed;
       partial volume is blocks x |C| x 16 B — ~13 GB total for a 100 TB
       corpus at 128 MB blocks and the default 1024 candidates, streamed
       through the tree, never resident at once (per fixed-row batches it
       would be ~20x that);
       a target rank whose value IS a candidate (tie mass straddles it)
       resolves immediately;
    3. a sparse bracket fetch for unresolved ranks — only values strictly
       inside the bracketing candidate gap (expected n/n_candidates rows)
       ever reach one worker task; if an adversarial gap exceeds
       ``bracket_limit`` the pass recurses inside the gap instead of
       fetching it.

    Returns {q: float value} with ``quantile_cont`` linear interpolation
    (position q*(n-1)), matching DuckDB bit-for-bit.
    """
    import ray
    from engine.shuffle import tree_reduce

    def _partial(b: pa.Table) -> pa.Table:
        v = pc.drop_null(b.column(col)).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = v[~np.isnan(v)]
        v.sort()
        if len(v) > sample_per_block:
            idx = np.linspace(0, len(v) - 1, sample_per_block)
            samp = v[idx.astype(np.int64)]
        else:
            samp = v
        return pa.table({"cnt": pa.array([len(v)], pa.int64()),
                         "samp": pa.array([samp.tolist()],
                                          pa.list_(pa.float64()))})

    def _merge(tbl: pa.Table) -> pa.Table:
        cnt = int(pc.sum(tbl.column("cnt")).as_py() or 0)
        flat = np.concatenate([np.asarray(x, dtype=np.float64)
                               for x in tbl.column("samp").to_pylist()]
                              or [np.array([], dtype=np.float64)])
        flat.sort()
        if len(flat) > n_candidates:
            idx = np.linspace(0, len(flat) - 1, n_candidates)
            flat = flat[idx.astype(np.int64)]
        return pa.table({"cnt": pa.array([cnt], pa.int64()),
                         "samp": pa.array([flat.tolist()],
                                          pa.list_(pa.float64()))})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    merged = tree_reduce(parts, _merge).to_pandas()
    n = int(merged["cnt"].sum())
    if n == 0:
        return {float(q): float("nan") for q in qs}
    cand = np.sort(np.concatenate(
        [np.asarray(x, dtype=np.float64) for x in merged["samp"]]))
    if len(cand) > n_candidates:
        idx = np.linspace(0, len(cand) - 1, n_candidates)
        cand = cand[idx.astype(np.int64)]
    cand = np.unique(cand)

    def _rank_counts(candidates):
        """Tree-summed (count(x < c), count(x <= c)) over the corpus."""
        ref = ray.put(candidates)

        class _Ranks:
            def __init__(self, r):
                self.r = r
                self._c = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if self._c is None:
                    self._c = ray.get(self.r) if isinstance(
                        self.r, ray.ObjectRef) else self.r
                v = pc.drop_null(b.column(col)) \
                    .to_numpy(zero_copy_only=False).astype(np.float64)
                v = v[~np.isnan(v)]
                v.sort()
                lt = np.searchsorted(v, self._c, side="left")
                le = np.searchsorted(v, self._c, side="right")
                return pa.table({
                    "lt": pa.array([lt.tolist()], pa.list_(pa.int64())),
                    "le": pa.array([le.tolist()], pa.list_(pa.int64()))})

        def _sum(tbl: pa.Table) -> pa.Table:
            lt = np.sum([np.asarray(x, dtype=np.int64)
                         for x in tbl.column("lt").to_pylist()], axis=0)
            le = np.sum([np.asarray(x, dtype=np.int64)
                         for x in tbl.column("le").to_pylist()], axis=0)
            return pa.table({
                "lt": pa.array([lt.tolist()], pa.list_(pa.int64())),
                "le": pa.array([le.tolist()], pa.list_(pa.int64()))})

        rp = ds.map_batches(_Ranks(ref), batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
        out = tree_reduce(rp, _sum).to_pandas()
        lt = np.sum([np.asarray(x, dtype=np.int64) for x in out["lt"]],
                    axis=0)
        le = np.sum([np.asarray(x, dtype=np.int64) for x in out["le"]],
                    axis=0)
        return lt, le

    def _value_at_rank(k: int, cand, lt, le, depth: int = 0) -> float:
        """Exact value of sorted[k] (0-based)."""
        # resolved by tie mass: some candidate c has count(<c) <= k < (<=c)
        hit = np.flatnonzero((lt <= k) & (k < le))
        if len(hit):
            return float(cand[hit[0]])
        # bracket: largest c with count(<=c) <= k, smallest c with
        # count(<c) > k
        lo_i = np.flatnonzero(le <= k)
        hi_i = np.flatnonzero(lt > k)
        lo = float(cand[lo_i[-1]]) if len(lo_i) else -np.inf
        hi = float(cand[hi_i[0]]) if len(hi_i) else np.inf
        base = int(le[lo_i[-1]]) if len(lo_i) else 0
        gap = (int(lt[hi_i[0]]) if len(hi_i) else n) - base
        if gap > bracket_limit and depth < max_refine:
            sub, slt, sle = _refine(lo, hi, base)
            return _value_at_rank(k, sub, slt, sle, depth + 1)

        def _fetch(b: pa.Table) -> pa.Table:
            v = pc.drop_null(b.column(col)) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[(v > lo) & (v < hi) & ~np.isnan(v)]
            return pa.table({"v": pa.array(v, pa.float64())})

        vals = np.sort(ds.map_batches(
            _fetch, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).to_pandas()["v"].to_numpy())
        return float(vals[k - base])

    def _refine(lo: float, hi: float, base: int):
        """Re-run the candidate pass restricted to the open gap (lo, hi)."""
        def _gap_partial(b: pa.Table) -> pa.Table:
            v = pc.drop_null(b.column(col)) \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[(v > lo) & (v < hi) & ~np.isnan(v)]
            v.sort()
            if len(v) > sample_per_block:
                idx = np.linspace(0, len(v) - 1, sample_per_block)
                v = v[idx.astype(np.int64)]
            return pa.table({"cnt": pa.array([0], pa.int64()),
                             "samp": pa.array([v.tolist()],
                                              pa.list_(pa.float64()))})

        gp = ds.map_batches(_gap_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=batch_size)
        gm = tree_reduce(gp, _merge).to_pandas()
        sub = np.unique(np.sort(np.concatenate(
            [np.asarray(x, dtype=np.float64) for x in gm["samp"]])))
        slt, sle = _rank_counts(sub)
        return sub, slt, sle

    lt, le = _rank_counts(cand)
    out = {}
    cache: dict = {}
    for q in qs:
        p = float(q) * (n - 1)
        k0, k1 = int(np.floor(p)), int(np.ceil(p))
        for k in (k0, k1):
            if k not in cache:
                cache[k] = _value_at_rank(k, cand, lt, le)
        frac = p - k0
        out[float(q)] = cache[k0] + (cache[k1] - cache[k0]) * frac
    return out


def iqr_outliers(ds, col: str, *, k: float = 1.5,
                 batch_size=None):
    """Rows outside the Tukey fences ``[q1 - k*IQR, q3 + k*IQR]`` of
    ``col`` — the classic data-quality outlier screen, with the EXACT
    quantile operator supplying the fences (a sketch-derived fence would
    flag different rows on different runs; this one is deterministic and
    SQL-reproducible). The fence scan is map-only; NULL/NaN rows never
    match."""
    q = exact_quantiles(ds, col, [0.25, 0.75], batch_size=batch_size)
    iqr = q[0.75] - q[0.25]
    lo, hi = q[0.25] - k * iqr, q[0.75] + k * iqr

    def _f(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            mask = ((v < lo) | (v > hi)) & ~np.isnan(v)
        return b.filter(pa.array(mask))

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def winsorize(ds, col: str, *, lower_q: float = 0.05,
              upper_q: float = 0.95, batch_size=None):
    """Clip ``col`` to its exact ``[lower_q, upper_q]`` quantile fences —
    the standard heavy-tail guard before feature scaling. The fences come
    from :func:`exact_quantiles` (bit-compatible with ``quantile_cont``),
    so the clip is SQL-reproducible: ``least(greatest(v, lo), hi)``.

    The clip pass is map-only (one ``np.clip`` per block); rows with a
    NULL value are dropped (SQL parity: ``WHERE col IS NOT NULL``) so the
    output column is never NaN-vs-NULL ambiguous. Returns the input rows
    with ``col`` replaced by the clipped value.
    """
    q = exact_quantiles(ds, col, [lower_q, upper_q], batch_size=batch_size)
    lo, hi = q[float(lower_q)], q[float(upper_q)]

    def _clip(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(col)))
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        return b.set_column(b.schema.get_field_index(col), col,
                            pa.array(np.clip(v, lo, hi), pa.float64()))

    return ds.map_batches(_clip, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def quantile_buckets(ds, col: str, *, qs: Sequence[float] = (0.25, 0.5,
                                                             0.75),
                     batch_size=None):
    """Equal-frequency discretization: assign each row the 1-based bucket
    ``1 + count(fences < value)`` where the fences are the EXACT
    ``quantile_cont`` values of ``qs`` (:func:`exact_quantiles`) — the
    standard quantile-binning step before bucketed features or stratified
    downstream joins, SQL-reproducible as ``1 + (v > q1)::int + ...``.

    The fence pass is the shuffle-free distributed selection; the assign
    pass is map-only (one ``np.searchsorted`` per block against the tiny
    broadcast fence array). NULL values are dropped (``WHERE col IS NOT
    NULL``). Returns the input rows plus an int64 ``bucket`` column.
    """
    fences = exact_quantiles(ds, col, list(qs), batch_size=batch_size)
    cuts = np.array([fences[float(q)] for q in sorted(qs)],
                    dtype=np.float64)

    def _assign(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(col)))
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        bucket = 1 + np.searchsorted(cuts, v, side="left")
        return b.append_column("bucket",
                               pa.array(bucket.astype(np.int64)))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def robust_zscore(ds, col: str, *, id_col: str, batch_size=None):
    """Median/MAD robust z-score: ``(v - median) / mad`` with ``mad =
    median(|v - median|)`` — the outlier score that, unlike the mean/std
    z-score, is not itself dragged by the outliers it is meant to flag.

    Two exact distributed selection passes (:func:`exact_quantiles` — the
    second over a map-only ``|v - med|`` projection), then a map-only
    scoring pass; nothing shuffles. NULL values are dropped (``WHERE col
    IS NOT NULL``); a zero MAD (>= half the mass at the median) yields
    NULL scores, matching SQL NULL-on-division-by-zero. Returns
    (id, rz). No consistency constant is applied — multiply by 1/1.4826
    outside if a normal-equivalent sigma is wanted.
    """
    med = exact_quantiles(ds, col, [0.5], batch_size=batch_size)[0.5]

    def _absdev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(col)))
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"absdev": pa.array(np.abs(v - med),
                                            pa.float64())})

    dev = ds.map_batches(_absdev, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=batch_size)
    mad = exact_quantiles(dev, "absdev", [0.5], batch_size=batch_size)[0.5]

    def _score(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column(col)))
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        if mad == 0.0:
            rz = pa.array([None] * len(v), pa.float64())
        else:
            rz = pa.array((v - med) / mad, pa.float64())
        return pa.table({id_col: b.column(id_col), "rz": rz})

    return ds.map_batches(_score, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def grouped_moments(ds, *, group_col: str, value_col: str,
                    batch_size=None):
    """Per-group count / mean / sample-stddev / min / max in ONE corpus
    pass — the classic sufficient-statistics shape: each block collapses
    to per-group ``(n, sum, sumsq, min, max)`` combiner rows inside
    ``map_batches``, so only group-count rows ever shuffle, and the final
    moments come from the merged sums (``var = (s2 - s1^2/n)/(n-1)``).

    The sum-of-squares estimator's cancellation error is ~sqrt(n)*eps
    relative to ``s2`` — far below any reporting precision for values
    within a few orders of magnitude of their mean (the adversarial case,
    mean >> stddev by 1e8, is the one textbook caveat). NULL values are
    ignored (SQL aggregate semantics). Returns
    (group, n, mean, std_samp, vmin, vmax); groups with n == 1 report
    NULL std_samp like ``stddev_samp``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum, Min, Max
    from engine.shuffle import balance

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "n": [], "s1": [],
                                 "s2": [], "vmin": [], "vmax": []})
        sub = df[[group_col, value_col]].dropna()
        v = sub[value_col].astype(np.float64)
        g = pd.DataFrame({group_col: sub[group_col], "v": v, "v2": v * v}) \
            .groupby(group_col, sort=False).agg(
                n=("v", "size"), s1=("v", "sum"), s2=("v2", "sum"),
                vmin=("v", "min"), vmax=("v", "max")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = balance(ds.map_batches(_partial, batch_format="pandas",
                                   batch_size=batch_size))
    agg = parts.groupby(group_col).aggregate(
        Sum("n"), Sum("s1"), Sum("s2"), Min("vmin"), Max("vmax"))

    def _final(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s1 = b.column("sum(s1)").to_numpy(zero_copy_only=False)
        s2 = b.column("sum(s2)").to_numpy(zero_copy_only=False)
        mean = s1 / n
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.maximum(s2 - s1 * s1 / n, 0.0) / (n - 1.0)
            std = np.where(n > 1, np.sqrt(var), np.nan)
        return pa.table({
            group_col: b.column(group_col),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "mean": pa.array(mean, pa.float64()),
            "std_samp": pa.array([None if np.isnan(x) else float(x)
                                  for x in std], pa.float64()),
            "vmin": pc.cast(b.column("min(vmin)"), pa.float64()),
            "vmax": pc.cast(b.column("max(vmax)"), pa.float64())})

    res = agg.map_batches(_final, batch_format="pyarrow")
    # Ray never invokes the UDF on empty blocks (the num_columns guard
    # would be dead code), so an all-filtered corpus — every value NULL —
    # yields a SCHEMALESS empty that breaks downstream sort/select. The
    # result is group-bounded, so materializing here is free (the groupby
    # was a barrier anyway) and lets us substitute a typed empty.
    res = res.materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], column_dtype(ds, group_col)),
             "n": pa.array([], pa.int64()),
             "mean": pa.array([], pa.float64()),
             "std_samp": pa.array([], pa.float64()),
             "vmin": pa.array([], pa.float64()),
             "vmax": pa.array([], pa.float64())}))
    return res


def grouped_corr(ds, *, group_col: str, x_col: str, y_col: str,
                 batch_size=None):
    """Per-group Pearson correlation of two numeric columns in ONE corpus
    pass via sufficient statistics ``(n, sx, sy, sxx, syy, sxy)`` combined
    inside ``map_batches`` — only group-count rows shuffle.

    ``r = (sxy - sx*sy/n) / sqrt((sxx - sx^2/n) * (syy - sy^2/n))`` —
    algebraically ``corr(x, y)``; rows where EITHER value is NULL are
    dropped (SQL pairwise semantics). Groups with n < 2 or zero variance
    report NULL. Returns (group, n, corr).
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "n": [], "sx": [],
                                 "sy": [], "sxx": [], "syy": [], "sxy": []})
        sub = df[[group_col, x_col, y_col]].dropna()
        x = sub[x_col].astype(np.float64)
        y = sub[y_col].astype(np.float64)
        g = pd.DataFrame({group_col: sub[group_col], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y}) \
            .groupby(group_col, sort=False).agg(
                n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                sxx=("xx", "sum"), syy=("yy", "sum"),
                sxy=("xy", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = balance(ds.map_batches(_partial, batch_format="pandas",
                                   batch_size=batch_size))
    agg = parts.groupby(group_col).aggregate(
        Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"), Sum("syy"), Sum("sxy"))

    def _final(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sx = b.column("sum(sx)").to_numpy(zero_copy_only=False)
        sy = b.column("sum(sy)").to_numpy(zero_copy_only=False)
        sxx = b.column("sum(sxx)").to_numpy(zero_copy_only=False)
        syy = b.column("sum(syy)").to_numpy(zero_copy_only=False)
        sxy = b.column("sum(sxy)").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = sxy - sx * sy / n
            vx = sxx - sx * sx / n
            vy = syy - sy * sy / n
            r = cov / np.sqrt(vx * vy)
            r = np.where((n > 1) & (vx > 0) & (vy > 0), r, np.nan)
        return pa.table({
            group_col: b.column(group_col),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "corr": pa.array([None if np.isnan(x) else float(x)
                              for x in r], pa.float64())})

    res = agg.map_batches(_final, batch_format="pyarrow")
    # Same all-filtered-corpus schemaless-empty corner as grouped_moments:
    # materialize (group-bounded, the groupby was a barrier anyway) and
    # substitute a typed empty so downstream sort/select keep working.
    res = res.materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], column_dtype(ds, group_col)),
             "n": pa.array([], pa.int64()),
             "corr": pa.array([], pa.float64())}))
    return res


def grouped_quantiles(ds, *, group_col: str, value_col: str,
                      qs: Sequence[float], batch_size: int = 65536):
    """Per-group exact ``quantile_cont`` quantiles: one output row per
    (group, q).

    Whole groups co-locate on P coarse hash partitions (the standard
    two-level shape, engine/shuffle.py) and one vectorized pandas
    group-quantile call runs per partition — linear interpolation matches
    DuckDB ``quantile_cont`` bit-for-bit. Assumes each group's values fit
    a worker (the same contract as every map_groups stage here); for a
    single group at corpus scale use ``exact_quantiles``, which never
    co-locates the data.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    qlist = [float(q) for q in qs]

    def _part(df):
        out = df[[group_col, value_col]].copy()
        out["part"] = (hash64(df[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _quant(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "q": [], "value": []})
        g = df.dropna(subset=[value_col]).groupby(group_col)[value_col]
        frames = []
        for q in qlist:
            s = g.quantile(q, interpolation="linear")
            frames.append(pd.DataFrame({
                group_col: s.index.to_numpy(),
                "q": np.full(len(s), q),
                "value": s.to_numpy()}))
        return pd.concat(frames, ignore_index=True)

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_quant, batch_format="pandas")


def value_histogram(ds, col: str, *, lo: float, hi: float, bins: int,
                    batch_size: int = 65536):
    """Fixed-bin histogram of a numeric column over ``[lo, hi]`` — one
    (bin, n) row per non-empty bin; values outside the range and NULL/NaN
    are dropped, and ``hi`` lands in the last bin.

    Binning uses the single expression ``min(floor((x - lo) * bins /
    (hi - lo)), bins - 1)`` so a SQL oracle reproduces bin edges
    bit-for-bit (numpy and DuckDB evaluate the identical float64 ops).
    Partial ``bincount`` per batch -> a bins-bounded groupby-sum; the
    corpus never shuffles.
    """
    from ray.data.aggregate import Sum
    from engine.shuffle import balance
    w = float(hi) - float(lo)

    def _partial(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            keep = (v >= lo) & (v <= hi) & ~np.isnan(v)
        v = v[keep]
        idx = np.minimum(np.floor((v - lo) * bins / w),
                         bins - 1).astype(np.int64)
        counts = np.bincount(idx, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    parts = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    agg = balance(parts).groupby("bin").aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"bin": b.column("bin"),
                         "n": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow")
    # Ray never invokes the UDF on empty blocks, so an all-filtered corpus
    # yields a SCHEMALESS empty that breaks downstream sort/select. The
    # result is bins-bounded, so materializing it here is free (the
    # groupby was a barrier anyway) and lets us substitute a typed empty.
    res = res.materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"bin": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}))
    return res


def percentile_rank(ds, col: str, *, id_col: str,
                    distinct_limit: int = 4_000_000,
                    batch_size: int = 65536):
    """Exact per-row percentile rank: ``count(x < v) / (n - 1)`` — SQL
    ``percent_rank() OVER (ORDER BY col)`` parity (ties share a rank;
    NULL/NaN rows are dropped).

    Two passes: distinct-value counts aggregate first (in-batch combiner,
    value-bounded groupby), then the sorted (value, cumulative-count) CDF
    broadcasts once via ``ray.put`` and every row resolves map-only with
    one searchsorted. The gate: the CDF is O(distinct values) — above
    ``distinct_limit`` this op refuses (ValueError) rather than silently
    materializing an unbounded array; bucket/round the column upstream or
    use ``exact_quantiles`` + interpolation for an approximate rank.
    """
    import ray
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _vc(b: pa.Table) -> pa.Table:
        v = pc.cast(b.column(col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v)]
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.float64()),
                         "c": pa.array(c.astype(np.int64))})

    counts = balance(ds.map_batches(_vc, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=batch_size)) \
        .groupby("v").aggregate(Sum("c")).materialize()
    n_distinct = counts.count()
    if n_distinct > distinct_limit:
        raise ValueError(
            f"{n_distinct} distinct values exceed distinct_limit="
            f"{distinct_limit}; bucket the column or use exact_quantiles")
    cdf = counts.to_pandas().sort_values("v")
    vals = cdf["v"].to_numpy()
    cnts = cdf["sum(c)"].to_numpy()
    n = int(cnts.sum())
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    ref = ray.put((vals, below, n))

    class _Rank:
        def __init__(self, r):
            self.r = r
            self._s = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._s is None:
                self._s = ray.get(self.r) if isinstance(
                    self.r, ray.ObjectRef) else self.r
            vals_, below_, n_ = self._s
            v = pc.cast(b.column(col), pa.float64()) \
                .to_numpy(zero_copy_only=False)
            keep = ~np.isnan(v)
            sub = b.filter(pa.array(keep))
            idx = np.searchsorted(vals_, v[keep])
            denom = max(n_ - 1, 1)
            return pa.table({
                id_col: sub.column(id_col),
                "pct_rank": pa.array(below_[idx] / denom, pa.float64())})

    return ds.map_batches(_Rank(ref), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def grouped_weighted_mean(ds, *, group_col: str, value_col: str,
                          weight_col: str, batch_size=None):
    """Per-group weighted mean — ``sum(value * weight) / sum(weight)``
    over rows where BOTH value and weight are non-NULL (the SQL mirror
    filters the same pair, since a NULL on either side would null the
    product but not the bare ``sum(weight)``). A group whose weights sum
    to exactly zero reports NULL (SQL ``CASE WHEN sum(w) = 0``).

    Same sufficient-statistics shape as :func:`grouped_moments`: each
    block collapses to per-group ``(n, swx, sw)`` combiner rows inside
    ``map_batches``, only group-count rows shuffle, and the final divide
    is vectorized. Returns (group, n, weighted_mean).
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "n": [], "swx": [],
                                 "sw": []})
        sub = df[[group_col, value_col, weight_col]].dropna(
            subset=[value_col, weight_col])
        w = sub[weight_col].astype(np.float64)
        g = pd.DataFrame({group_col: sub[group_col],
                          "wx": sub[value_col].astype(np.float64) * w,
                          "w": w}) \
            .groupby(group_col, sort=False).agg(
                n=("w", "size"), swx=("wx", "sum"),
                sw=("w", "sum")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = balance(ds.map_batches(_partial, batch_format="pandas",
                                   batch_size=batch_size))
    agg = parts.groupby(group_col).aggregate(Sum("n"), Sum("swx"),
                                             Sum("sw"))

    def _final(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False)
        swx = b.column("sum(swx)").to_numpy(zero_copy_only=False)
        sw = b.column("sum(sw)").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            wm = np.where(sw != 0.0, swx / sw, np.nan)
        return pa.table({
            group_col: b.column(group_col),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "weighted_mean": pa.array([None if np.isnan(x) else float(x)
                                       for x in wm], pa.float64())})

    res = agg.map_batches(_final, batch_format="pyarrow")
    # Bounded final: materialize + typed-empty substitution on an
    # all-filtered corpus (Ray never calls UDFs on empty blocks — see
    # grouped_moments).
    res = res.materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], column_dtype(ds, group_col)),
             "n": pa.array([], pa.int64()),
             "weighted_mean": pa.array([], pa.float64())}))
    return res


def grouped_histogram(ds, *, group_col: str, col: str, lo: float,
                      hi: float, bins: int, batch_size: int = 65536):
    """Per-group fixed-bin histogram over ``[lo, hi]`` — one
    (group, bin, n) row per non-empty cell; out-of-range / NULL values
    and NULL groups are dropped. The bin expression is the same
    bit-for-bit SQL-reproducible ``min(floor((x - lo) * bins / (hi -
    lo)), bins - 1)`` as :func:`value_histogram`.

    Scale shape: a per-batch pandas (group, bin) size combiner bounds
    the shuffle at (groups x bins) rows per block — the corpus never
    shuffles; the final two-key groupby-sum is (groups x bins)-bounded,
    so it materializes for the typed-empty substitution like the other
    bounded finals.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance
    w = float(hi) - float(lo)

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [],
                                 "bin": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        v = df[col].to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            keep = (v >= lo) & (v <= hi) & ~np.isnan(v) \
                & df[group_col].notna().to_numpy()
        sub = df.loc[keep, [group_col]].copy()
        vv = v[keep]
        sub["bin"] = np.minimum(np.floor((vv - lo) * bins / w),
                                bins - 1).astype(np.int64)
        g = sub.groupby([group_col, "bin"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby([group_col, "bin"]).aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({group_col: b.column(group_col),
                         "bin": b.column("bin"),
                         "n": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], column_dtype(ds, group_col)),
             "bin": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}))
    return res


def mutual_information(ds, *, a_col: str, b_col: str, lo: float,
                       hi: float, bins: int, batch_size: int = 65536):
    """Mutual information (nats) between a categorical column and a
    fixed-bin bucketing of a numeric column — the feature-relevance
    screen of a training pipeline. Rows with NULL category or
    out-of-range/NULL values drop; the bin expression is the
    SQL-reproducible one of :func:`value_histogram`. Returns ONE row
    (mi, n); an empty contingency reports (NULL, 0).

    Scale shape: the per-batch (category, bin) count combiner bounds the
    shuffle at vocabulary x bins rows per block; the MI reduce runs
    worker-side over the single coalesced contingency block (repartition
    to 1 block of a vocabulary-x-bins-bounded table — never a driver
    loop).
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance
    w = float(hi) - float(lo)

    def _partial(df):
        if a_col not in df.columns or not len(df):
            return pd.DataFrame({"a": [], "b": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        v = df[b_col].to_numpy(np.float64)
        with np.errstate(invalid="ignore"):
            keep = (v >= lo) & (v <= hi) & ~np.isnan(v) \
                & df[a_col].notna().to_numpy()
        sub = pd.DataFrame({"a": df.loc[keep, a_col].to_numpy()})
        vv = v[keep]
        sub["b"] = np.minimum(np.floor((vv - lo) * bins / w),
                              bins - 1).astype(np.int64)
        g = sub.groupby(["a", "b"], sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(["a", "b"]).aggregate(Sum("n"))

    def _mi(df):
        if "a" not in df.columns or not len(df):
            return pd.DataFrame({"mi": pd.array([], dtype="float64"),
                                 "n": pd.array([], dtype="int64")})
        n = df["sum(n)"].to_numpy(np.float64)
        t = n.sum()
        na = df.groupby("a", sort=False)["sum(n)"].transform("sum") \
            .to_numpy(np.float64)
        nb = df.groupby("b", sort=False)["sum(n)"].transform("sum") \
            .to_numpy(np.float64)
        mi = float(((n / t) * np.log((n * t) / (na * nb))).sum())
        return pd.DataFrame({"mi": [mi], "n": [int(t)]})

    res = agg.repartition(1).map_batches(
        _mi, batch_format="pandas", batch_size=None).materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"mi": pa.array([None], pa.float64()),
             "n": pa.array([0], pa.int64())}))
    return res


def grouped_gini(ds, *, group_col: str, value_col: str,
                 batch_size: int = 65536):
    """Per-group Gini concentration of a numeric column — the sorted-rank
    identity ``sum((2*rank - n - 1) * x) / (n * sum(x))`` (``rank`` =
    1-based position in the group's value-ascending order; the sum is
    tie-order invariant, so any stable sort matches SQL's
    ``row_number``-based spelling). NULL values / NULL groups drop; a
    group whose values sum to zero reports NULL (the SQL mirror's ``CASE
    WHEN s != 0``). Returns (group, gini, n).

    Scale shape: whole groups co-locate on P coarse hash partitions
    (only (group, value) rows shuffle, once); per partition ONE sort +
    grouped cumcount/transform Cython kernels — no per-group loop. The
    per-group-fits-worker contract matches grouped_quantiles.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _part(df):
        out = df[[group_col, value_col]].dropna().copy()
        out["part"] = (hash64(out[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _gini(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "gini": [],
                                 "n": pd.array([], dtype="int64")})
        sub = df.sort_values([group_col, value_col],
                             kind="mergesort").reset_index(drop=True)
        g = sub.groupby(group_col, sort=False)
        rn = g.cumcount().to_numpy(np.float64) + 1.0
        n = g[value_col].transform("size").to_numpy(np.float64)
        v = sub[value_col].to_numpy(np.float64)
        w = pd.Series((2.0 * rn - n - 1.0) * v)
        agg = pd.DataFrame({
            "wsum": w.groupby(sub[group_col], sort=False).sum(),
            "s": g[value_col].sum(),
            "n": g[value_col].size().astype(np.int64)})
        with np.errstate(invalid="ignore", divide="ignore"):
            gini = np.where(agg["s"] != 0.0,
                            agg["wsum"] / (agg["n"] * agg["s"]), np.nan)
        out = pd.DataFrame({"gini": gini, "n": agg["n"].to_numpy()})
        out.insert(0, group_col, agg.index.to_numpy())
        return out

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_gini, batch_format="pandas")


def grouped_iqr_outliers(ds, *, group_col: str, value_col: str,
                         id_col: str, k: float = 1.5,
                         batch_size: int = 65536):
    """Rows outside their GROUP's Tukey fences — ``value < q1 - k*iqr OR
    value > q3 + k*iqr`` with per-group exact linear-interpolated
    quartiles (``quantile_cont`` parity). NULL values / NULL groups
    drop. Returns the outlier rows (id, group, value).

    Scale shape: one shuffle co-locates whole groups on P coarse hash
    partitions; the fences are computed IN the partition (grouped
    ``transform('quantile')`` — one call per group, not per row) and the
    filter happens in the same pass — no fence join, no broadcast, no
    second corpus pass. The global sibling is :func:`iqr_outliers`.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, group_col, value_col]

    def _part(df):
        out = df[cols].dropna(subset=[group_col, value_col]).copy()
        out["part"] = (hash64(out[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _flag(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], group_col: [],
                                 value_col: []})
        g = df.groupby(group_col, sort=False)[value_col]
        q1 = g.transform("quantile", 0.25).to_numpy(np.float64)
        q3 = g.transform("quantile", 0.75).to_numpy(np.float64)
        iqr = q3 - q1
        v = df[value_col].to_numpy(np.float64)
        m = (v < q1 - k * iqr) | (v > q3 + k * iqr)
        return df.loc[m, cols].reset_index(drop=True)

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_flag, batch_format="pandas")


def spearman_corr(ds, *, x_col: str, y_col: str,
                  distinct_limit: int = 4_000_000,
                  batch_size: int = 65536):
    """Spearman rank correlation between two numeric columns — Pearson
    over average (tie-sharing) ranks, the SQL spelling ``corr(rank() +
    (peers - 1)/2, ...)``. Rows are excluded PAIRWISE (either side
    NULL); returns ONE row (spearman_r, n), NULL r when n < 2 or a side
    is constant. Ranks are exact, not sampled.

    Scale shape (the :func:`percentile_rank` pattern, doubled): one
    corpus pass emits tagged per-batch value counts (value-bounded
    groupby), the two sorted (value, avg-rank) CDFs broadcast once via
    ``ray.put`` — gated at ``distinct_limit`` distinct values per side —
    then a map-only pass resolves both ranks via searchsorted and folds
    the six sufficient statistics one row per block; no row-level data
    ever reaches the driver.
    """
    import ray
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _vc(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column(x_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        y = pc.cast(b.column(y_col), pa.float64()) \
            .to_numpy(zero_copy_only=False)
        keep = ~(np.isnan(x) | np.isnan(y))
        ux, cx = np.unique(x[keep], return_counts=True)
        uy, cy = np.unique(y[keep], return_counts=True)
        return pa.table({
            "tag": pa.array(np.r_[np.zeros(len(ux), np.int8),
                                  np.ones(len(uy), np.int8)]),
            "v": pa.array(np.r_[ux, uy], pa.float64()),
            "c": pa.array(np.r_[cx, cy].astype(np.int64))})

    counts = balance(ds.map_batches(_vc, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=batch_size)) \
        .groupby(["tag", "v"]).aggregate(Sum("c")).materialize()
    cdf = counts.to_pandas()
    if not len(cdf):
        return pa.table({"spearman_r": pa.array([None], pa.float64()),
                         "n": pa.array([0], pa.int64())})

    def _ranks(sub):
        sub = sub.sort_values("v")
        cnt = sub["sum(c)"].to_numpy(np.float64)
        below = np.concatenate([[0.0], np.cumsum(cnt)[:-1]])
        return sub["v"].to_numpy(), below + (cnt + 1.0) / 2.0

    per_side = {t: g for t, g in cdf.groupby("tag")}
    if max(len(g) for g in per_side.values()) > distinct_limit:
        raise ValueError(
            f"distinct values exceed distinct_limit={distinct_limit}; "
            "bucket the columns or sample")
    vx, arx = _ranks(per_side[0])
    vy, ary = _ranks(per_side[1])
    ref = ray.put((vx, arx, vy, ary))

    class _Stats:
        def __init__(self, r):
            self.r = r
            self._s = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._s is None:
                self._s = ray.get(self.r) if isinstance(
                    self.r, ray.ObjectRef) else self.r
            vx_, arx_, vy_, ary_ = self._s
            x = pc.cast(b.column(x_col), pa.float64()) \
                .to_numpy(zero_copy_only=False)
            y = pc.cast(b.column(y_col), pa.float64()) \
                .to_numpy(zero_copy_only=False)
            keep = ~(np.isnan(x) | np.isnan(y))
            rx = arx_[np.searchsorted(vx_, x[keep])]
            ry = ary_[np.searchsorted(vy_, y[keep])]
            return pa.table({
                "n": pa.array([int(keep.sum())], pa.int64()),
                "sx": pa.array([float(rx.sum())], pa.float64()),
                "sy": pa.array([float(ry.sum())], pa.float64()),
                "sxx": pa.array([float((rx * rx).sum())], pa.float64()),
                "syy": pa.array([float((ry * ry).sum())], pa.float64()),
                "sxy": pa.array([float((rx * ry).sum())], pa.float64())})

    parts = ds.map_batches(_Stats(ref), batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    t = parts.sum(["n", "sx", "sy", "sxx", "syy", "sxy"])
    n = int(t["sum(n)"] or 0)
    r = None
    if n >= 2:
        sx, sy = t["sum(sx)"], t["sum(sy)"]
        den2 = (n * t["sum(sxx)"] - sx * sx) \
            * (n * t["sum(syy)"] - sy * sy)
        if den2 > 0:
            r = float((n * t["sum(sxy)"] - sx * sy) / np.sqrt(den2))
    return pa.table({"spearman_r": pa.array([r], pa.float64()),
                     "n": pa.array([n], pa.int64())})


def corr_matrix(ds, *, cols: Sequence[str], batch_size=None):
    """All pairwise Pearson correlations between numeric columns in ONE
    corpus pass — ``corr(x, y)`` per unordered pair with SQL's PAIRWISE
    NULL exclusion (each pair keeps rows where BOTH sides are non-NULL).
    Returns (col_x, col_y, r, n) with col_x < col_y; r is NULL when
    n < 2 or either side is constant.

    Scale shape: each block collapses to C(k, 2) sufficient-statistic
    rows (n, sx, sy, sxx, syy, sxy) inside ``map_batches``, so the
    shuffle is pairs x blocks rows regardless of corpus size; the final
    divide is a pairs-bounded groupby.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]

    def _partial(df):
        rows = {"col_x": [], "col_y": [], "n": [], "sx": [], "sy": [],
                "sxx": [], "syy": [], "sxy": []}
        if not len(df) or cols[0] not in df.columns:
            out = pd.DataFrame(rows)
            out["n"] = out["n"].astype(np.int64)
            return out
        arr = {c: df[c].to_numpy(np.float64) for c in cols}
        for a, b in pairs:
            x, y = arr[a], arr[b]
            keep = ~(np.isnan(x) | np.isnan(y))
            xs, ys = x[keep], y[keep]
            rows["col_x"].append(a)
            rows["col_y"].append(b)
            rows["n"].append(int(keep.sum()))
            rows["sx"].append(float(xs.sum()))
            rows["sy"].append(float(ys.sum()))
            rows["sxx"].append(float((xs * xs).sum()))
            rows["syy"].append(float((ys * ys).sum()))
            rows["sxy"].append(float((xs * ys).sum()))
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(["col_x", "col_y"]).aggregate(
        Sum("n"), Sum("sx"), Sum("sy"), Sum("sxx"), Sum("syy"),
        Sum("sxy"))

    def _final(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sx = b.column("sum(sx)").to_numpy(zero_copy_only=False)
        sy = b.column("sum(sy)").to_numpy(zero_copy_only=False)
        sxx = b.column("sum(sxx)").to_numpy(zero_copy_only=False)
        syy = b.column("sum(syy)").to_numpy(zero_copy_only=False)
        sxy = b.column("sum(sxy)").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
            r = np.where((n >= 2) & (den2 > 0),
                         (n * sxy - sx * sy) / np.sqrt(den2), np.nan)
        return pa.table({
            "col_x": b.column("col_x"), "col_y": b.column("col_y"),
            "r": pa.array([None if np.isnan(v) else float(v)
                           for v in r], pa.float64()),
            "n": pa.array(n.astype(np.int64), pa.int64())})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"col_x": pa.array([], pa.string()),
             "col_y": pa.array([], pa.string()),
             "r": pa.array([], pa.float64()),
             "n": pa.array([], pa.int64())}))
    return res


def grouped_quantile_buckets(ds, *, group_col: str, value_col: str,
                             id_col: str, batch_size: int = 65536):
    """Equal-frequency quartile bucket (1..4) of each row WITHIN its
    group — per-group exact linear-interpolated fences
    (``quantile_cont`` parity), bucket = 1 + (v > q1) + (v > q2) +
    (v > q3). NULL values / NULL groups drop. Returns
    (id, group, bucket). The global sibling is :func:`quantile_buckets`.

    Scale shape: one shuffle co-locates whole groups on P coarse hash
    partitions; fences are computed IN the partition (grouped
    ``transform('quantile')``, one call per group) and the bucket assign
    happens in the same vectorized pass — no fence join or broadcast.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, group_col, value_col]

    def _part(df):
        out = df[cols].dropna(subset=[group_col, value_col]).copy()
        out["part"] = (hash64(out[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _assign(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], group_col: [],
                                 "bucket": pd.array([], dtype="int64")})
        g = df.groupby(group_col, sort=False)[value_col]
        v = df[value_col].to_numpy(np.float64)
        bucket = np.ones(len(df), dtype=np.int64)
        for q in (0.25, 0.5, 0.75):
            bucket += (v > g.transform("quantile", q)
                       .to_numpy(np.float64)).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             group_col: df[group_col].to_numpy(),
                             "bucket": bucket})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_assign, batch_format="pandas")


def grouped_mad(ds, *, group_col: str, value_col: str,
                batch_size: int = 65536):
    """Per-group median absolute deviation (plus the count) — ``median(
    abs(v - median(v)))`` with continuous-interpolation medians
    (``median``/``quantile_cont`` parity). NULL values / NULL groups
    drop. Returns (group, mad, n). The global robust-z sibling is
    :func:`robust_zscore`.

    Scale shape: whole groups co-locate on P coarse hash partitions
    (only (group, value) rows shuffle once); both selection passes are
    grouped pandas kernels inside the partition — no second corpus
    pass, no fence join.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _part(df):
        out = df[[group_col, value_col]].dropna().copy()
        out["part"] = (hash64(out[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _mad(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "mad": [],
                                 "n": pd.array([], dtype="int64")})
        g = df.groupby(group_col, sort=False)[value_col]
        med = g.transform("median").to_numpy(np.float64)
        dev = pd.Series(np.abs(df[value_col].to_numpy(np.float64)
                               - med))
        gg = dev.groupby(df[group_col], sort=False)
        out = pd.DataFrame({"mad": gg.median().to_numpy(np.float64),
                            "n": gg.size().to_numpy(np.int64)})
        out.insert(0, group_col, gg.median().index.to_numpy())
        return out

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_mad, batch_format="pandas")


def pareto_share(ds, *, key_col: str, value_col: str,
                 top_frac: float = 0.2, batch_size: int = 65536):
    """Pareto concentration: the share of the total value held by the
    top ``ceil(top_frac * n)`` keys ranked by their value sum — the
    "do 20% of customers drive 80% of revenue" metric. NULL keys /
    values drop. Returns ONE row (top_share, n_keys); NULL share when
    the total is zero or there are no keys.

    Scale shape: the per-key sums come from the standard in-batch
    combiner + key groupby (bounded at the key count); the rank cutoff
    reduce runs worker-side over ONE coalesced block of that bounded
    aggregate (same pattern as mutual_information). For key counts that
    outgrow a single worker block, use a quantile fence from
    ``exact_quantiles`` instead — documented trade-off, not a silent
    cap.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "v": []})
        sub = df[[key_col, value_col]].dropna()
        g = sub.groupby(key_col, sort=False)[value_col].sum() \
            .rename("v").reset_index()
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(key_col).aggregate(Sum("v"))

    def _share(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({"top_share": [],
                                 "n_keys": pd.array([], dtype="int64")})
        v = np.sort(df["sum(v)"].to_numpy(np.float64))[::-1]
        n = len(v)
        k = int(np.ceil(top_frac * n))
        tot = v.sum()
        share = float(v[:k].sum() / tot) if tot != 0.0 else np.nan
        return pd.DataFrame({"top_share": [share], "n_keys": [n]})

    res = agg.repartition(1).map_batches(
        _share, batch_format="pandas", batch_size=None).materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"top_share": pa.array([None], pa.float64()),
             "n_keys": pa.array([0], pa.int64())}))
    return res


def grouped_count_mean(ds, *, group_cols: Sequence[str], value_col: str,
                       batch_size=None):
    """Count + mean of a value per MULTI-column group — the generic
    profile aggregate ((source, lang) -> doc count + mean length). Rows
    with any NULL group member or NULL value drop. Returns
    (*group_cols, n, mean).

    Same sufficient-statistics shape as :func:`grouped_weighted_mean`:
    per-block (n, s) combiner rows, a (group-tuple)-bounded groupby, a
    vectorized final divide, and the typed-empty substitution on
    all-filtered input.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance
    gcols = list(group_cols)

    def _partial(df):
        if not len(df) or gcols[0] not in df.columns:
            out = pd.DataFrame({c: [] for c in gcols})
            out["n"] = pd.array([], dtype="int64")
            out["s"] = pd.array([], dtype="float64")
            return out
        sub = df[gcols + [value_col]].dropna()
        g = sub.groupby(gcols, sort=False)[value_col] \
            .agg(["size", "sum"]).reset_index()
        g.columns = gcols + ["n", "s"]
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(gcols).aggregate(Sum("n"), Sum("s"))

    def _final(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        cols = {c: b.column(c) for c in gcols}
        cols["n"] = pa.array(n.astype(np.int64), pa.int64())
        cols["mean"] = pa.array(s / n, pa.float64())
        return pa.table(cols)

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        cols = {c: pa.array([], column_dtype(ds, c)) for c in gcols}
        cols["n"] = pa.array([], pa.int64())
        cols["mean"] = pa.array([], pa.float64())
        return ray.data.from_arrow(pa.table(cols))
    return res
