"""Relational pipelines: partial-aggregate groupbys, broadcast joins, windowed
event aggregates — the generic query surface (every one DuckDB-checkable).

Patterns (the point, at 100 TB):
* groupbys pre-aggregate inside ``map_batches`` (few groups -> each batch
  collapses to group-count rows) before the small shuffle;
* small dimension tables broadcast via ``ray.put`` and hash-lookup inside
  ``map_batches`` — never a data-data shuffle join;
* event windows bucket by ``date_trunc`` inside the batch then groupby the
  (already tiny) bucket rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def q1_pricing_summary(lineitem_ds, *, batch_size: int = 65536,
                       concurrency=None):
    """TPC-H Q1-style multi-aggregate groupby over lineitem."""

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_numpy(
                zero_copy_only=False),
            "l_linestatus": batch.column("l_linestatus").to_numpy(
                zero_copy_only=False),
            "qty": batch.column("l_quantity").to_numpy(zero_copy_only=False),
            "price": batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False),
            "disc": batch.column("l_discount").to_numpy(zero_copy_only=False),
        })
        df["disc_price"] = df["price"] * (1.0 - df["disc"])
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("qty", "sum"), sum_base_price=("price", "sum"),
            sum_disc_price=("disc_price", "sum"), count_order=("qty", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from engine.shuffle import balance
    partials = balance(lineitem_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency))
    from ray.data.aggregate import Sum
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty"), Sum("sum_base_price"), Sum("sum_disc_price"),
        Sum("count_order"))

    def _final(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b.column("sum(count_order)"), pa.float64())
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "sum_qty": b.column("sum(sum_qty)"),
            "sum_base_price": b.column("sum(sum_base_price)"),
            "sum_disc_price": b.column("sum(sum_disc_price)"),
            "avg_qty": pc.divide(b.column("sum(sum_qty)"), cnt),
            "count_order": b.column("sum(count_order)"),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


def _revenue_by_segment_join(orders_ds, customer_ds, batch_size,
                             concurrency):
    """Distributed fall-through for a dimension too large to broadcast:
    orders pre-aggregate per custkey inside ``map_batches`` (combiner), the
    partials hash-join the dimension, and the (tiny) per-segment groupby
    finishes — the dimension never touches the driver."""
    from engine.shuffle import balance, join_partitions

    def _opartial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "c_custkey": b.column("o_custkey").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "p": b.column("o_totalprice").to_numpy(zero_copy_only=False)})
        g = df.groupby("c_custkey", sort=False).agg(
            revenue=("p", "sum"), n_orders=("p", "size")).reset_index()
        return pa.table({
            "c_custkey": pa.array(g["c_custkey"], pa.int64()),
            "revenue": pa.array(g["revenue"], pa.float64()),
            "n_orders": pa.array(g["n_orders"].astype(np.int64))})

    op = orders_ds.map_batches(_opartial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=batch_size,
                               concurrency=concurrency)
    dim = customer_ds.select_columns(["c_custkey", "c_mktsegment"])
    joined = op.join(dim, join_type="inner",
                     num_partitions=join_partitions(), on=("c_custkey",))

    def _norm(b: pa.Table) -> pa.Table:
        # empty hash-join partitions come out schemaless (see dedup.py)
        if b.num_columns == 0:
            return pa.table({"c_mktsegment": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64()),
                             "n_orders": pa.array([], pa.int64())})
        return b.select(["c_mktsegment", "revenue", "n_orders"])

    partials = balance(joined.map_batches(_norm, batch_format="pyarrow"))
    from ray.data.aggregate import Sum
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("revenue"), Sum("n_orders"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "revenue": b.column("sum(revenue)"),
            "n_orders": b.column("sum(n_orders)"),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


def revenue_by_segment(orders_ds, customer_ds, *, batch_size: int = 65536,
                       concurrency=None, broadcast_limit: int = 2_000_000):
    """orders x customer join -> revenue per market segment.

    Size-gated routing (the ``count_dangling_fk`` broadcast_limit pattern):
    a dimension below ``broadcast_limit`` rows ships ONCE via ``ray.put``
    as a key->segment lookup and the join is map-only; a larger dimension —
    it scales with the corpus (TPC-H customer = 0.15N), so at 100x it does
    not fit a driver dict — falls through to a distributed hash join of
    per-batch revenue partials against the dimension table.
    """
    import ray

    if customer_ds.count() > broadcast_limit:
        return _revenue_by_segment_join(orders_ds, customer_ds, batch_size,
                                        concurrency)

    cust = customer_ds.select_columns(
        ["c_custkey", "c_mktsegment"]).to_pandas()
    lookup = dict(zip(cust["c_custkey"].astype(np.int64),
                      cust["c_mktsegment"]))
    ref = ray.put(lookup)

    class _JoinAgg:
        def __init__(self, side):
            self._ref = side
            self._lut = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pandas as pd
            if self._lut is None:
                self._lut = ray.get(self._ref)
            keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            price = batch.column("o_totalprice").to_numpy(
                zero_copy_only=False)
            seg = pd.Series(keys).map(self._lut)  # vectorized hash lookup
            df = pd.DataFrame({"c_mktsegment": seg, "p": price})
            df = df[df["c_mktsegment"].notna()]
            g = df.groupby("c_mktsegment", sort=False).agg(
                revenue=("p", "sum"), n_orders=("p", "size")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

    from engine.shuffle import balance
    partials = balance(orders_ds.map_batches(
        _JoinAgg(ref), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency))
    from ray.data.aggregate import Sum
    agg = partials.groupby("c_mktsegment").aggregate(
        Sum("revenue"), Sum("n_orders"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_mktsegment": b.column("c_mktsegment"),
            "revenue": b.column("sum(revenue)"),
            "n_orders": b.column("sum(n_orders)"),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


def events_per_user_hour(events_ds, *, batch_size: int = 65536,
                         concurrency=None):
    """Windowed aggregate: events bucketed to (user, hour) with count +
    value sum (streaming-friendly: buckets partial-aggregated per batch)."""

    import pandas as pd

    from engine.shuffle import reduce_blocks
    from engine.sketches import _splitmix, hash64

    P = reduce_blocks()

    def _partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts")
        hour = pc.floor_temporal(ts, unit="hour")
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False),
            "hour": hour.to_numpy(zero_copy_only=False),
            "value": batch.column("value").to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["user_id", "hour"], sort=False).agg(
            n_events=("value", "size"),
            value_sum=("value", "sum")).reset_index()
        # two-level grouping (engine/dedup.py pattern): (user, hour) rows
        # hash to P coarse partitions and ONE vectorized pandas aggregation
        # finishes each partition — Ray's per-group reduce over ~10^5
        # groups was the dominant cost of this window at sf0.1
        with np.errstate(over="ignore"):
            h = _splitmix(hash64(g["user_id"].to_numpy(), 3)
                          ^ g["hour"].to_numpy().astype("int64")
                          .astype(np.uint64), 5)
        g["part"] = (h % np.uint64(P)).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def _sum_part(df):
        if "user_id" not in df.columns or not len(df):
            return pd.DataFrame({"user_id": [], "hour": [], "n_events": [],
                                 "value_sum": []})
        g = df.groupby(["user_id", "hour"], as_index=False).agg(
            n_events=("n_events", "sum"), value_sum=("value_sum", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        # pandas produced ns; emit us to match SQL date_trunc exactly
        g["hour"] = g["hour"].astype("datetime64[us]")
        return g[["user_id", "hour", "n_events", "value_sum"]]

    partials = events_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)
    return partials.groupby("part").map_groups(
        _sum_part, batch_format="pandas")


def sessionize(events_ds, *, gap_minutes: int = 30, batch_size: int = 65536):
    """Gap-based sessionization: events of one user sorted by time; a gap
    > ``gap_minutes`` starts a new session. Shuffle key = user_id (each
    user's events must be co-located and ordered — the documented
    partitioning assumption).

    Users hash to P coarse partitions (P tracks cluster CPUs) and ONE
    vectorized UDF sessionizes a whole partition — sort by (user, ts),
    break sessions where the user changes or the gap exceeds the
    threshold, aggregate with boundary arithmetic. Per-group pandas
    overhead is O(P), not O(#users) (the same two-level grouping as the
    LSH pair stages, engine/dedup.py).

    Output: (user_id, session_id, n_events, session_start, session_end).
    """
    import pandas as pd

    from engine.shuffle import reduce_blocks
    from engine.sketches import hash64

    gap = np.timedelta64(gap_minutes * 60, "s")
    P = reduce_blocks()
    out_cols = ["user_id", "session_id", "n_events", "session_start",
                "session_end"]

    def _part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        part = (hash64(uid) % np.uint64(P)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def _sessions_part(df: "pd.DataFrame") -> "pd.DataFrame":
        if "user_id" not in df.columns or not len(df):
            return pd.DataFrame({c: [] for c in out_cols})
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy()
        uid = df["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap]
        new_session = new_user | gap_break
        sid_global = np.cumsum(new_session)
        user_first_sid = sid_global[np.flatnonzero(new_user)]
        user_ord = np.cumsum(new_user) - 1
        sid = sid_global - user_first_sid[user_ord] + 1
        s_start = np.flatnonzero(new_session)
        s_end = np.r_[s_start[1:], len(ts)]
        return pd.DataFrame({
            "user_id": uid[s_start],
            "session_id": sid[s_start].astype("int64"),
            "n_events": (s_end - s_start).astype("int64"),
            # us precision to match SQL timestamps exactly
            "session_start": ts[s_start].astype("datetime64[us]"),
            "session_end": ts[s_end - 1].astype("datetime64[us]"),
        })

    return events_ds.select_columns(["user_id", "ts"]).map_batches(
        _part, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size).groupby("part").map_groups(
        _sessions_part, batch_format="pandas")


def session_aggregate(events_ds, *, gap_minutes: int = 30,
                      val_col: str = "value", batch_size: int = 65536):
    """Gap-based sessions WITH per-session value aggregates — the
    :func:`sessionize` kernel extended with boundary-difference prefix
    sums over the value column, so each session also reports its value
    SUM and non-NULL value count in the same single vectorized pass (no
    second shuffle, no per-session loop).

    SQL aggregate NULL semantics: NULL values contribute nothing; an
    all-NULL session reports ``value_sum`` NULL and ``n_values`` 0.
    Output: (user_id, session_id, n_events, session_start, session_end,
    value_sum, n_values). Same partitioning contract as
    :func:`sessionize` (whole users co-located, shuffle key = user hash).
    """
    import pandas as pd

    from engine.shuffle import reduce_blocks
    from engine.sketches import hash64

    gap = np.timedelta64(gap_minutes * 60, "s")
    P = reduce_blocks()
    out_cols = ["user_id", "session_id", "n_events", "session_start",
                "session_end", "value_sum", "n_values"]

    def _part(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        part = (hash64(uid) % np.uint64(P)).astype(np.int64)
        return b.append_column("part", pa.array(part))

    def _sessions_part(df: "pd.DataFrame") -> "pd.DataFrame":
        if "user_id" not in df.columns or not len(df):
            return pd.DataFrame({c: [] for c in out_cols})
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        ts = df["ts"].to_numpy()
        uid = df["user_id"].to_numpy()
        v = df[val_col].to_numpy().astype(np.float64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap_break = np.r_[False, (ts[1:] - ts[:-1]) > gap]
        new_session = new_user | gap_break
        sid_global = np.cumsum(new_session)
        user_first_sid = sid_global[np.flatnonzero(new_user)]
        user_ord = np.cumsum(new_user) - 1
        sid = sid_global - user_first_sid[user_ord] + 1
        s_start = np.flatnonzero(new_session)
        s_end = np.r_[s_start[1:], len(ts)]
        ok = ~np.isnan(v)
        cs = np.concatenate([[0.0], np.cumsum(np.where(ok, v, 0.0))])
        cn = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
        sums = cs[s_end] - cs[s_start]
        cnts = cn[s_end] - cn[s_start]
        return pd.DataFrame({
            "user_id": uid[s_start],
            "session_id": sid[s_start].astype("int64"),
            "n_events": (s_end - s_start).astype("int64"),
            # us precision to match SQL timestamps exactly
            "session_start": ts[s_start].astype("datetime64[us]"),
            "session_end": ts[s_end - 1].astype("datetime64[us]"),
            "value_sum": np.where(cnts > 0, sums, np.nan),
            "n_values": cnts,
        })

    return events_ds.select_columns(["user_id", "ts", val_col]) \
        .map_batches(_part, batch_format="pyarrow", zero_copy_batch=True,
                     batch_size=batch_size).groupby("part").map_groups(
        _sessions_part, batch_format="pandas")


def top_event_types(events_ds, *, k: int = 5, batch_size: int = 65536):
    """Global top-k event types by count (partial counts -> tiny sort)."""

    def _partial(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        u, c = np.unique(et, return_counts=True)
        return pa.table({"event_type": pa.array(u.tolist(), pa.string()),
                         "cnt": pa.array(c, pa.int64())})

    from engine.shuffle import balance
    partials = balance(events_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size))
    agg = partials.groupby("event_type").sum("cnt")

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"event_type": b.column("event_type"),
                         "n_events": b.column("sum(cnt)")})

    out = agg.map_batches(_final, batch_format="pyarrow")
    return out.sort(["n_events", "event_type"],
                    descending=[True, False]).limit(k)


def grouped_topk(ds, *, group_col: str, score_col: str, id_col: str,
                 k: int = 5, ascending: bool = False,
                 batch_size: int = 65536):
    """Top-``k`` rows per group by ``score_col`` (ties broken by
    ``id_col`` ascending — fully deterministic, SQL ``row_number()``
    parity).

    Scale shape: an in-batch per-group top-k combiner bounds the shuffle at
    (groups x k) rows per block — the corpus itself never shuffles; the
    final pass co-locates whole groups on P coarse hash partitions (P
    tracks cluster CPUs) and runs ONE vectorized sort-and-head per
    partition, not one pandas call per group. A single hot group costs
    O(blocks x k) final rows, so skew is bounded by design.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    by = [group_col, score_col, id_col]
    order = [True, ascending, True]

    def _topk(df):
        return df.sort_values(by, ascending=order, kind="mergesort") \
            .groupby(group_col, sort=False).head(k)

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({c: [] for c in by})
        return _topk(df[by])

    def _part(df):
        out = df.copy()
        out["part"] = (hash64(df[group_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _final(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({c: [] for c in by})
        return _topk(df[by])

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .map_batches(_part, batch_format="pandas") \
        .groupby("part").map_groups(_final, batch_format="pandas")


def _rolling_frames(df, *, key_col, ts_col, val_col, id_col,
                    window_seconds):
    """Shared RANGE-frame kernel for the rolling-window operators: sort
    a partition by (key, ts, id), then compute every trailing-window
    frame's non-NULL value sum and count with one ``np.searchsorted``
    pair over a monotone composite timestamp (each key's times shifted
    into a disjoint range separated by more than the window) — no
    per-key Python loop. Tie peers at the current row's timestamp are
    included (``side="right"``), matching SQL RANGE frames.

    NULL-ts contract: rows with a NULL timestamp are DROPPED first —
    they have no place on a RANGE axis, and the NaT->int64 sentinel
    (-2**63) would otherwise break the composite's monotonicity and
    corrupt every frame in the partition. NULL KEYS group as ONE
    partition, exactly like SQL ``PARTITION BY`` — elementwise
    ``NaN != NaN`` is True, so without the both-null mask every NULL-key
    row would silently become its own single-row partition (None-keyed
    object arrays compare ``None != None`` False, so the two NULL
    spellings would even disagree with each other). Returns
    (sub, sums, cnts).
    """
    sub, v, j, e = _rolling_bounds(df, key_col=key_col, ts_col=ts_col,
                                   val_col=val_col, id_col=id_col,
                                   window_seconds=window_seconds)
    if not len(sub):
        return sub, np.array([]), np.array([], dtype=np.int64)
    ok = ~np.isnan(v)
    cs = np.concatenate([[0.0], np.cumsum(np.where(ok, v, 0.0))])
    cw = np.concatenate([[0], np.cumsum(ok.astype(np.int64))])
    return sub, cs[e] - cs[j], cw[e] - cw[j]


def _rolling_bounds(df, *, key_col, ts_col, val_col, id_col,
                    window_seconds):
    """The frame-boundary half of :func:`_rolling_frames`: returns
    ``(sub, v, j, e)`` where ``sub`` is the NULL-ts-dropped partition
    sorted by (key, ts, id), ``v`` its float64 values, and row i's RANGE
    frame is ``sub[j[i]:e[i]]`` (tie peers included). Shared by the
    sum/count/mean kernels (prefix sums over the bounds) and the min/max
    kernel (sparse-table range reduce over the bounds)."""
    import pandas as pd
    sub = df.dropna(subset=[ts_col]) \
        .sort_values([key_col, ts_col, id_col],
                     kind="mergesort").reset_index(drop=True)
    if not len(sub):
        return sub, np.array([]), np.array([], dtype=np.int64), \
            np.array([], dtype=np.int64)
    ts = sub[ts_col].to_numpy()
    if np.issubdtype(ts.dtype, np.datetime64):
        t = ts.astype("datetime64[ns]").astype(np.int64) / 1e9
    else:
        t = ts.astype(np.float64)
    keys = sub[key_col].to_numpy()
    knull = pd.isna(keys)
    with np.errstate(invalid="ignore"):
        neq = keys[1:] != keys[:-1]
    new_key = np.r_[True, neq & ~(knull[1:] & knull[:-1])]
    key_ord = np.cumsum(new_key) - 1
    span = (t.max() - t.min()) + window_seconds + 1.0
    m = key_ord * span + (t - t.min())
    v = sub[val_col].to_numpy().astype(np.float64)
    j = np.searchsorted(m, m - window_seconds, side="left")
    e = np.searchsorted(m, m, side="right")
    return sub, v, j, e


def rolling_window_mean(ds, *, key_col: str = "user_id",
                        ts_col: str = "ts", val_col: str = "value",
                        id_col: str = "event_id",
                        window_seconds: float = 3 * 3600,
                        batch_size: int = 65536):
    """Per-key rolling mean over a trailing time window — SQL ``avg(...)
    OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN <w> PRECEDING AND
    CURRENT ROW)`` semantics, including tie peers at the current row's
    timestamp and NULL-skipping averages. NULL-ts rows are dropped (see
    :func:`_rolling_frames`).

    Scale shape: whole keys co-locate on P coarse hash partitions
    (P tracks cluster CPUs) and ONE vectorized pass runs per partition
    (:func:`_rolling_frames`). Only the events table shuffles, once, by
    key hash.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(df[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _roll(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "rolling_mean": []})
        sub, sums, cnts = _rolling_frames(
            df, key_col=key_col, ts_col=ts_col, val_col=val_col,
            id_col=id_col, window_seconds=window_seconds)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.nan)
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "rolling_mean": mean})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_roll, batch_format="pandas")


def asof_join(left, right, *, key_col: str = "user_id",
              ts_col: str = "ts", value_col: str = "value",
              left_id_col: str = "event_id", right_id_col: str = "event_id",
              batch_size: int = 65536):
    """Point-in-time (as-of) inner join: each left row matches the latest
    right row of the same key with ``right.ts <= left.ts`` — DuckDB
    ``ASOF JOIN`` semantics. Right-side (key, ts) ties dedup to the row
    with the greatest ``right_id_col`` so the match is deterministic.

    Ray Data has no asof join; this composes one from the primitives the
    repo already relies on: both sides co-partition ONCE by key hash
    (whole keys per partition), and one vectorized pass per partition
    matches every left row via a single ``searchsorted`` over the right
    side's monotone composite timestamp (each key's times shifted into
    disjoint ranges) — no per-key Python loop, no driver state. Returns
    (left_id, key, value) for matched rows.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = ["id", "key", "t", "val", "side"]

    def _tag(side: int, id_col: str, with_val: bool):
        def _fn(df):
            if key_col not in df.columns or not len(df):
                return pd.DataFrame({c: [] for c in cols + ["part"]})
            ts = df[ts_col].to_numpy()
            if np.issubdtype(ts.dtype, np.datetime64):
                t = ts.astype("datetime64[ns]").astype(np.int64) / 1e9
            else:
                t = ts.astype(np.float64)
            keys = df[key_col].to_numpy()
            return pd.DataFrame({
                "id": df[id_col].to_numpy(),
                "key": keys, "t": t,
                "val": df[value_col].to_numpy().astype(np.float64)
                if with_val else np.full(len(df), np.nan),
                "side": np.full(len(df), side, dtype=np.int8),
                "part": (hash64(keys) % np.uint64(P)).astype(np.int64)})
        return _fn

    def _match(df):
        out_cols = {left_id_col: [], key_col: [], value_col: []}
        if "key" not in df.columns or not len(df):
            return pd.DataFrame(out_cols)
        l = df[df["side"] == 0]
        r = df[df["side"] == 1]
        if not len(l) or not len(r):
            return pd.DataFrame(out_cols)
        # dedup right (key, t) ties to the greatest right id, then sort
        r = r.sort_values(["key", "t", "id"], kind="mergesort") \
            .drop_duplicates(["key", "t"], keep="last")
        uk = pd.Index(pd.unique(np.concatenate(
            [r["key"].to_numpy(), l["key"].to_numpy()])))
        t_all = np.concatenate([r["t"].to_numpy(), l["t"].to_numpy()])
        tmin = t_all.min()
        span = (t_all.max() - tmin) + 1.0
        ko_r = uk.get_indexer(r["key"].to_numpy())
        ko_l = uk.get_indexer(l["key"].to_numpy())
        m_r = ko_r * span + (r["t"].to_numpy() - tmin)
        m_l = ko_l * span + (l["t"].to_numpy() - tmin)
        order = np.argsort(m_r, kind="mergesort")
        m_r = m_r[order]
        r_keys = r["key"].to_numpy()[order]
        r_vals = r["val"].to_numpy()[order]
        idx = np.searchsorted(m_r, m_l, side="right") - 1
        safe = np.clip(idx, 0, len(m_r) - 1)
        valid = (idx >= 0) & (r_keys[safe] == l["key"].to_numpy())
        return pd.DataFrame({
            left_id_col: l["id"].to_numpy()[valid],
            key_col: l["key"].to_numpy()[valid],
            value_col: r_vals[safe][valid]})

    u = left.map_batches(_tag(0, left_id_col, False),
                         batch_format="pandas", batch_size=batch_size) \
        .union(right.map_batches(_tag(1, right_id_col, True),
                                 batch_format="pandas",
                                 batch_size=batch_size))
    return u.groupby("part").map_groups(_match, batch_format="pandas")


def interval_join(points, intervals, *, key_col: str = "user_id",
                  ts_col: str = "ts", start_col: str = "start",
                  end_col: str = "end", max_duration_s: float,
                  point_id_col: str = "event_id",
                  interval_id_col: str = "interval_id",
                  batch_size: int = 65536):
    """Range join: every (point, interval) pair of the same key with
    ``start <= ts < end`` — overlapping intervals per key emit one row per
    match.

    ``max_duration_s`` must bound every interval's length (the classic
    bounded-range-join contract; split longer intervals upstream). With
    that bound, a point's candidate intervals are exactly those whose
    start falls in ``(ts - max_duration, ts]`` — one vectorized
    searchsorted window over the start-sorted intervals per coarse key
    partition, expanded with repeat/cumsum arithmetic (no per-point
    Python loop), then filtered by ``end > ts``. Both sides shuffle once,
    by key hash. Returns (point_id, interval_id, key).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _to_sec(arr):
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[ns]").astype(np.int64) / 1e9
        return arr.astype(np.float64)

    def _tag_points(df):
        cols = {"id": [], "key": [], "t0": [], "t1": [], "side": [],
                "part": []}
        if key_col not in df.columns or not len(df):
            return pd.DataFrame(cols)
        keys = df[key_col].to_numpy()
        t = _to_sec(df[ts_col].to_numpy())
        return pd.DataFrame({
            "id": df[point_id_col].to_numpy(), "key": keys,
            "t0": t, "t1": t,
            "side": np.zeros(len(df), dtype=np.int8),
            "part": (hash64(keys) % np.uint64(P)).astype(np.int64)})

    def _tag_intervals(df):
        cols = {"id": [], "key": [], "t0": [], "t1": [], "side": [],
                "part": []}
        if key_col not in df.columns or not len(df):
            return pd.DataFrame(cols)
        keys = df[key_col].to_numpy()
        s = _to_sec(df[start_col].to_numpy())
        e = _to_sec(df[end_col].to_numpy())
        if len(s) and float(np.max(e - s)) > max_duration_s:
            raise ValueError("interval longer than max_duration_s; "
                             "split long intervals upstream")
        return pd.DataFrame({
            "id": df[interval_id_col].to_numpy(), "key": keys,
            "t0": s, "t1": e,
            "side": np.ones(len(df), dtype=np.int8),
            "part": (hash64(keys) % np.uint64(P)).astype(np.int64)})

    def _match(df):
        out_cols = {point_id_col: [], interval_id_col: [], key_col: []}
        if "key" not in df.columns or not len(df):
            return pd.DataFrame(out_cols)
        p = df[df["side"] == 0]
        iv = df[df["side"] == 1]
        if not len(p) or not len(iv):
            return pd.DataFrame(out_cols)
        uk = pd.Index(pd.unique(np.concatenate(
            [iv["key"].to_numpy(), p["key"].to_numpy()])))
        t_all = np.concatenate([iv["t0"].to_numpy(), p["t0"].to_numpy()])
        tmin = t_all.min()
        span = (t_all.max() - tmin) + max_duration_s + 2.0
        m_iv = uk.get_indexer(iv["key"].to_numpy()) * span \
            + (iv["t0"].to_numpy() - tmin)
        order = np.argsort(m_iv, kind="mergesort")
        m_iv = m_iv[order]
        iv_end = iv["t1"].to_numpy()[order]
        iv_id = iv["id"].to_numpy()[order]
        iv_key = iv["key"].to_numpy()[order]
        m_p = uk.get_indexer(p["key"].to_numpy()) * span \
            + (p["t0"].to_numpy() - tmin)
        lo = np.searchsorted(m_iv, m_p - max_duration_s, side="left")
        hi = np.searchsorted(m_iv, m_p, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(out_cols)
        rep = np.repeat(np.arange(len(p)), counts)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        cand = np.arange(total) - offs[rep] + lo[rep]
        pt = p["t0"].to_numpy()[rep]
        ok = (iv_end[cand] > pt) & (iv_key[cand] == p["key"].to_numpy()[rep])
        return pd.DataFrame({
            point_id_col: p["id"].to_numpy()[rep][ok],
            interval_id_col: iv_id[cand][ok],
            key_col: p["key"].to_numpy()[rep][ok]})

    u = points.map_batches(_tag_points, batch_format="pandas",
                           batch_size=batch_size) \
        .union(intervals.map_batches(_tag_intervals, batch_format="pandas",
                                     batch_size=batch_size))
    return u.groupby("part").map_groups(_match, batch_format="pandas")


def q3_shipping_priority(lineitem_ds, orders_ds, customer_ds, *,
                         segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10,
                         batch_size: int = 65536, concurrency=None,
                         broadcast_limit: int = 2_000_000):
    """TPC-H Q3 shape: top-k orders by revenue for one market segment.

    Scale shape — one semi-join + ONE data-data hash join:

    1. segment customers filter orders: below ``broadcast_limit`` keys the
       distinct key array ships once via ``ray.put`` (vectorized np.isin
       per batch, date filter applied in the pass before); above it — the
       segment is ~N/5 customers, unbounded in the corpus — a distributed
       hash join on custkey does the semi-join. Only (o_orderkey,
       o_orderdate) survive either way;
    2. lineitem is filtered + pre-aggregated per l_orderkey INSIDE
       ``map_batches`` (combiner), so the hash join moves one partial
       revenue row per (orderkey x batch), never raw lineitem rows;
    3. ``Dataset.join`` on orderkey (partitions track cluster CPUs);
    4. final (orderkey, orderdate) groupby-sum is over joined partials;
       top-k via DISTRIBUTED sort + limit — the driver only ever sees the
       k result rows, not the full aggregate.
    """
    import ray

    from engine.shuffle import join_partitions

    cutoff64 = np.datetime64(cutoff, "us")

    cust = customer_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), segment))
        .select(["c_custkey"]), batch_format="pyarrow").materialize()

    def _date_filter(b: pa.Table) -> pa.Table:
        od = pc.cast(b.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(od < cutoff64))
        return pa.table({"o_custkey": sub.column("o_custkey"),
                         "o_orderkey": sub.column("o_orderkey"),
                         "o_orderdate": pc.cast(sub.column("o_orderdate"),
                                                pa.timestamp("us"))})

    dated = orders_ds.map_batches(_date_filter, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=batch_size,
                                  concurrency=concurrency)

    if cust.count() <= broadcast_limit:
        keys = np.unique(cust.to_pandas()["c_custkey"].to_numpy())
        keys_ref = ray.put(keys)

        def _semi(b: pa.Table) -> pa.Table:
            side = ray.get(keys_ref)
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
            sub = b.filter(pa.array(np.isin(ck, side)))
            return sub.select(["o_orderkey", "o_orderdate"])

        orders = dated.map_batches(_semi, batch_format="pyarrow")
    else:
        def _rename(b: pa.Table) -> pa.Table:
            return pa.table({"o_custkey": b.column("c_custkey")})

        dim = cust.map_batches(_rename, batch_format="pyarrow")
        joined_orders = dated.join(dim, join_type="inner",
                                   num_partitions=join_partitions(),
                                   on=("o_custkey",))

        def _norm_orders(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:  # schemaless empty join partition
                return pa.table({
                    "o_orderkey": pa.array([], pa.int64()),
                    "o_orderdate": pa.array([], pa.timestamp("us"))})
            return b.select(["o_orderkey", "o_orderdate"])

        orders = joined_orders.map_batches(_norm_orders,
                                           batch_format="pyarrow")

    def _li_partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        sd = pc.cast(b.column("l_shipdate"), pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array(sd > cutoff64))
        rev = (sub.column("l_extendedprice").to_numpy(zero_copy_only=False)
               * (1.0 - sub.column("l_discount").to_numpy(
                   zero_copy_only=False)))
        df = pd.DataFrame({
            "o_orderkey": sub.column("l_orderkey").to_numpy(
                zero_copy_only=False),
            "rev": rev}).groupby("o_orderkey", sort=False).sum(
        ).reset_index()
        return pa.table({"o_orderkey": pa.array(df["o_orderkey"]),
                         "rev": pa.array(df["rev"], pa.float64())})

    li = lineitem_ds.map_batches(_li_partial, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=batch_size,
                                 concurrency=concurrency)

    from engine.shuffle import join_partitions
    joined = li.join(orders, join_type="inner",
                     num_partitions=join_partitions(), on=("o_orderkey",))

    from ray.data.aggregate import Sum
    agg = joined.groupby(["o_orderkey", "o_orderdate"]).aggregate(Sum("rev"))

    def _final(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or len(b) == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "revenue": pa.array([], pa.float64())})
        rev = b.column("sum(rev)").to_numpy(zero_copy_only=False)
        rev = np.sign(rev) * np.floor(np.abs(rev) * 1e4 + 0.5) / 1e4
        return pa.table({
            "l_orderkey": b.column("o_orderkey"),
            "o_orderdate": pc.cast(b.column("o_orderdate"),
                                   pa.timestamp("us")),
            "revenue": pa.array(rev, pa.float64())})

    out = agg.map_batches(_final, batch_format="pyarrow")
    # distributed top-k: the qualifying (orderkey, orderdate) aggregate is
    # ~10^7-10^8 rows at 100x — sort().limit(k) keeps it off the driver
    top = out.sort(["revenue", "o_orderdate", "l_orderkey"],
                   descending=[True, False, False]).limit(k)
    return top.to_pandas().reset_index(drop=True)


def count_distinct(ds, *, group_col: str, value_col: str,
                   batch_size: int = 65536):
    """Exact distinct ``value_col`` count per ``group_col`` — the two-level
    shape that survives 10^12 rows: an in-batch (group, value) dedup
    combiner, a distinct pass over (group, value) pairs co-located by pair
    hash, then a bins-bounded per-group sum. The raw corpus collapses to
    distinct pairs before anything shuffles, and no stage ever holds a
    per-group value set in one task.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.sketches import hash64
    from engine.shuffle import balance, reduce_blocks
    P = reduce_blocks()

    def _pairs(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], value_col: [], "part": []})
        sub = df[[group_col, value_col]].dropna().drop_duplicates()
        with np.errstate(over="ignore"):
            h = hash64(sub[group_col].to_numpy()) \
                ^ hash64(sub[value_col].to_numpy(), 13)
        out = sub.copy()
        out["part"] = (h % np.uint64(P)).astype(np.int64)
        return out

    def _dedup_count(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [],
                                 "n": pd.array([], dtype="int64")})
        d = df.drop_duplicates([group_col, value_col])
        g = d.groupby(group_col, as_index=False).size()
        return pd.DataFrame({group_col: g[group_col].to_numpy(),
                             "n": g["size"].to_numpy().astype(np.int64)})

    partials = ds.map_batches(_pairs, batch_format="pandas",
                              batch_size=batch_size) \
        .groupby("part").map_groups(_dedup_count, batch_format="pandas")
    agg = balance(partials).groupby(group_col).aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({group_col: b.column(group_col),
                         "n_distinct": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow")
    # Ray never invokes the UDF on empty blocks, so an all-filtered corpus
    # yields a SCHEMALESS empty that breaks downstream sort/select. The
    # result is group-bounded, so materializing it here is free (the
    # groupby was a barrier anyway) and lets us substitute a typed empty.
    res = res.materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {group_col: pa.array([], column_dtype(ds, group_col)),
             "n_distinct": pa.array([], pa.int64())}))
    return res


def ewma(ds, *, key_col: str = "user_id", ts_col: str = "ts",
         val_col: str = "value", id_col: str = "event_id",
         alpha: float = 0.3, batch_size: int = 65536):
    """Per-key exponentially weighted moving average in event order
    (``y_1 = v_1``, ``y_n = alpha*v_n + (1-alpha)*y_{n-1}``; order =
    (ts, id) within key) — the online feature a streaming scorer keeps.

    Whole keys co-locate on P coarse hash partitions and pandas' grouped
    EWM Cython kernel runs ONCE per partition across all its keys (a
    single C pass, not one Python call per key). Only (key, ts, id, val)
    rows shuffle, once. Returns (id, ewma).

    NULL contract: rows with a NULL value are DROPPED before the
    recurrence (they emit no output row and do not advance the state) —
    SQL parity is ``WHERE val IS NOT NULL`` before the recursive CTE.
    Without the drop, pandas' ewm would carry-and-reweight past a NaN
    while the SQL recurrence would poison every later row of the key.
    NULL-KEY rows are dropped too (``AND key IS NOT NULL``): the
    recursive-CTE oracle's ``s.key = e.key`` join can never extend a
    NULL-key chain, and pandas' NaN-dropping groupby would otherwise
    emit a SHORTER ewm series than the sorted frame and crash the
    output constructor in the worker.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].dropna(subset=[val_col, key_col]).copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _ewm(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "ewma": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        y = sub.groupby(key_col, sort=False)[val_col] \
            .ewm(alpha=alpha, adjust=False).mean() \
            .reset_index(level=0, drop=True).sort_index()
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "ewma": y.to_numpy()})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_ewm, batch_format="pandas")


def ewma_halflife(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                  val_col: str = "value", id_col: str = "event_id",
                  halflife_seconds: float = 3600.0,
                  batch_size: int = 65536):
    """Per-key TIME-DECAYED exponentially weighted mean: the weight of an
    observation halves every ``halflife_seconds`` of elapsed time, so
    irregular event gaps decay correctly (a 3-day-old click matters less
    than one from 3 seconds ago regardless of how many rows sit between).

    ``y_n = sum_i 0.5^((t_n-t_i)/h) * v_i / sum_i 0.5^((t_n-t_i)/h)``
    (pandas ``ewm(halflife=Timedelta, times=...)`` semantics), computed by
    the incremental recurrence ``w' = w * 0.5^(dt/h); y_n = (w'*y_{n-1} +
    v_n)/(w'+1); w = w'+1`` — the same op order a recursive-CTE oracle can
    replay, so parity holds to float ulps.

    Distribution shape matches :func:`ewma`: whole keys co-locate on P
    coarse hash partitions (only (id, key, ts, val) rows shuffle, once)
    and pandas' grouped time-EWM Cython kernel runs once per partition.
    NULL contract: rows with NULL value, NULL timestamp OR NULL key are
    dropped before the recurrence (``WHERE val IS NOT NULL AND ts IS NOT
    NULL AND key IS NOT NULL`` — see :func:`ewma` for the NULL-key
    rationale). Returns (id, ewma_hl).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]
    hl = pd.Timedelta(seconds=halflife_seconds)

    def _part(df):
        out = df[cols].dropna(subset=[val_col, ts_col, key_col]).copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _ewm(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "ewma_hl": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        y = sub.groupby(key_col, sort=False)[val_col] \
            .ewm(halflife=hl, times=sub[ts_col]).mean() \
            .reset_index(level=0, drop=True).sort_index()
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "ewma_hl": y.to_numpy()})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_ewm, batch_format="pandas")


def lag_diff(ds, *, key_col: str = "user_id", ts_col: str = "ts",
             val_col: str = "value", id_col: str = "event_id",
             batch_size: int = 65536):
    """Per-key first difference in event order: ``v_n - v_{n-1}`` over
    rows ordered by (ts, id) within key — ``value - LAG(value) OVER
    (PARTITION BY key ORDER BY ts, id)`` parity. The first row of each
    key (and any row whose neighbor value is NULL) reports NULL.

    NULL keys group as ONE partition (``dropna=False``), exactly like SQL
    ``PARTITION BY`` — without it pandas' groupby silently excludes
    NaN-key rows and every NULL-key row would report NULL instead of its
    in-partition diff.

    Same distribution shape as :func:`ewma`: whole keys co-locate on P
    coarse hash partitions (only (id, key, ts, val) rows shuffle, once;
    NULL keys hash to one value, so the NULL partition stays whole) and
    one vectorized ``groupby(...).diff()`` Cython pass runs per
    partition. Returns (id, lag_diff).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _diff(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "lag_diff": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        d = sub.groupby(key_col, sort=False, dropna=False)[val_col].diff()
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "lag_diff": d.to_numpy()})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_diff, batch_format="pandas")


def q5_local_supplier_volume(lineitem_ds, orders_ds, customer_ds,
                             supplier_ds, nation_ds, region_ds, *,
                             region_name: str = "ASIA",
                             date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01",
                             batch_size: int = 65536,
                             broadcast_limit: int = 2_000_000):
    """TPC-H Q5: revenue per nation from lineitems where the customer and
    the supplier share a nation in ``region_name``, for one order year.

    Join orchestration at scale: region/nation are O(10^2) rows always
    (driver-safe); customer and supplier route by size — below
    ``broadcast_limit`` they ship once via ``ray.put`` as key->nationkey
    lookups and every attach is map-only, leaving ONE unavoidable
    big-big hash join (lineitem x filtered orders, sized to cluster
    CPUs); above the limit the attaches become distributed hash joins of
    the same shape. Revenue pre-aggregates per nation inside every
    post-join batch, so the final groupby sees nation-count rows.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum
    from engine.shuffle import balance, join_partitions

    nat = nation_ds.to_pandas()
    reg = region_ds.to_pandas()
    rkeys = set(reg[reg["r_name"] == region_name]["r_regionkey"])
    nat_in = nat[nat["n_regionkey"].isin(rkeys)]
    nation_keys = set(int(k) for k in nat_in["n_nationkey"])
    name_of = dict(zip(nat_in["n_nationkey"].astype(int),
                       nat_in["n_name"]))
    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    def _dim_lut(ds, key, nkey):
        """key -> nationkey lookup restricted to the region's nations."""
        def _f(b: pa.Table) -> pa.Table:
            nk = b.column(nkey).to_numpy(zero_copy_only=False)
            m = np.isin(nk, list(nation_keys))
            sub = b.filter(pa.array(m))
            return pa.table({"k": pc.cast(sub.column(key), pa.int64()),
                             "n": pc.cast(sub.column(nkey), pa.int64())})
        small = ds.map_batches(_f, batch_format="pyarrow",
                               batch_size=batch_size).to_pandas()
        return dict(zip(small["k"], small["n"]))

    if customer_ds.count() > broadcast_limit \
            or supplier_ds.count() > broadcast_limit:
        # distributed fall-through: same plan with hash joins for the
        # dimension attaches (aggregators sized to cluster CPUs)
        def _ofilter(b: pa.Table) -> pa.Table:
            d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
            keep = (d >= lo) & (d < hi)
            sub = b.filter(pa.array(keep))
            return pa.table({
                "o_orderkey": pc.cast(sub.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(sub.column("o_custkey"), pa.int64())})

        of = orders_ds.map_batches(_ofilter, batch_format="pyarrow",
                                   batch_size=batch_size)
        cust = customer_ds.select_columns(["c_custkey", "c_nationkey"])
        oc = of.join(cust, join_type="inner",
                     num_partitions=join_partitions(),
                     on=("o_custkey",), right_on=("c_custkey",))

        def _norm_oc(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:  # schemaless empty join partition
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "cnat": pa.array([], pa.int64())})
            return pa.table({
                "o_orderkey": b.column("o_orderkey"),
                "cnat": pc.cast(b.column("c_nationkey"), pa.int64())})

        oc = oc.map_batches(_norm_oc, batch_format="pyarrow")

        def _lpartial(b: pa.Table) -> pa.Table:
            price = b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (1.0 - disc), pa.float64())})

        li = lineitem_ds.map_batches(_lpartial, batch_format="pyarrow",
                                     batch_size=batch_size)
        lo_j = li.join(oc, join_type="inner",
                       num_partitions=join_partitions(),
                       on=("l_orderkey",), right_on=("o_orderkey",))

        def _norm_ls(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"l_suppkey": pa.array([], pa.int64()),
                                 "cnat": pa.array([], pa.int64()),
                                 "rev": pa.array([], pa.float64())})
            return b.select(["l_suppkey", "cnat", "rev"])

        ls = lo_j.map_batches(_norm_ls, batch_format="pyarrow")
        supp = supplier_ds.select_columns(["s_suppkey", "s_nationkey"])
        fin = ls.join(supp, join_type="inner",
                      num_partitions=join_partitions(),
                      on=("l_suppkey",), right_on=("s_suppkey",))

        def _partial_nat(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:
                return pa.table({"nkey": pa.array([], pa.int64()),
                                 "rev": pa.array([], pa.float64())})
            snat = pc.cast(b.column("s_nationkey"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            cnat = b.column("cnat").to_numpy(zero_copy_only=False)
            rev = b.column("rev").to_numpy(zero_copy_only=False)
            keep = (snat == cnat) & np.isin(snat, list(nation_keys))
            u, inv = np.unique(snat[keep], return_inverse=True)
            sums = np.bincount(inv, weights=rev[keep],
                               minlength=len(u)) if len(u) else \
                np.array([], dtype=np.float64)
            return pa.table({"nkey": pa.array(u, pa.int64()),
                             "rev": pa.array(sums, pa.float64())})

        partials = fin.map_batches(_partial_nat, batch_format="pyarrow")
    else:
        cust_lut = ray.put(_dim_lut(customer_ds, "c_custkey",
                                    "c_nationkey"))
        supp_lut = ray.put(_dim_lut(supplier_ds, "s_suppkey",
                                    "s_nationkey"))

        def _ofilter(b: pa.Table) -> pa.Table:
            d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
            keep = (d >= lo) & (d < hi)
            sub = b.filter(pa.array(keep))
            return pa.table({
                "o_orderkey": pc.cast(sub.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(sub.column("o_custkey"), pa.int64())})

        class _AttachCustNation:
            def __init__(self, ref):
                self.ref = ref
                self._lut = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if self._lut is None:
                    self._lut = ray.get(self.ref)
                ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
                cn = pd.Series(ck).map(self._lut)
                keep = cn.notna().to_numpy()
                return pa.table({
                    "o_orderkey": b.column("o_orderkey").filter(
                        pa.array(keep)),
                    "cnat": pa.array(cn[keep].astype(np.int64),
                                     pa.int64())})

        oc = orders_ds.map_batches(_ofilter, batch_format="pyarrow",
                                   batch_size=batch_size) \
            .map_batches(_AttachCustNation(cust_lut),
                         batch_format="pyarrow")

        def _lpartial(b: pa.Table) -> pa.Table:
            price = b.column("l_extendedprice").to_numpy(
                zero_copy_only=False)
            disc = b.column("l_discount").to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": pc.cast(b.column("l_orderkey"), pa.int64()),
                "l_suppkey": pc.cast(b.column("l_suppkey"), pa.int64()),
                "rev": pa.array(price * (1.0 - disc), pa.float64())})

        li = lineitem_ds.map_batches(_lpartial, batch_format="pyarrow",
                                     batch_size=batch_size)
        joined = li.join(oc, join_type="inner",
                         num_partitions=join_partitions(),
                         on=("l_orderkey",), right_on=("o_orderkey",))

        class _SuppAndPartial:
            def __init__(self, ref):
                self.ref = ref
                self._lut = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if b.num_columns == 0:  # schemaless empty join partition
                    return pa.table({"nkey": pa.array([], pa.int64()),
                                     "rev": pa.array([], pa.float64())})
                if self._lut is None:
                    self._lut = ray.get(self.ref)
                sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
                sn = pd.Series(sk).map(self._lut)
                cnat = b.column("cnat").to_numpy(zero_copy_only=False)
                rev = b.column("rev").to_numpy(zero_copy_only=False)
                keep = sn.notna().to_numpy() & (sn.to_numpy() == cnat)
                nk = sn[keep].astype(np.int64).to_numpy()
                u, inv = np.unique(nk, return_inverse=True)
                sums = np.bincount(inv, weights=rev[keep],
                                   minlength=len(u)) if len(u) else \
                    np.array([], dtype=np.float64)
                return pa.table({"nkey": pa.array(u, pa.int64()),
                                 "rev": pa.array(sums, pa.float64())})

        partials = joined.map_batches(_SuppAndPartial(supp_lut),
                                      batch_format="pyarrow")

    agg = balance(partials).groupby("nkey").aggregate(Sum("rev"))

    def _final(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        names = [name_of.get(int(k), "") for k in nk]
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "revenue": b.column("sum(rev)")})

    return agg.map_batches(_final, batch_format="pyarrow")


def keep_latest(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                id_col: str = "event_id", batch_size: int = 65536):
    """Log compaction: keep, per key, the single most recent row by
    ``(ts, id)`` — ``row_number() OVER (PARTITION BY key ORDER BY ts
    DESC, id DESC) = 1`` parity. The CDC / snapshot primitive: a 100-TB
    event log compacts to one row per live key.

    Two-level shape: an in-batch keep-latest combiner first shrinks every
    batch to at most its distinct-key count BEFORE anything shuffles (on
    an append-heavy log that is the bulk of the reduction), then whole
    keys co-locate on P coarse hash partitions and the same vectorized
    sort+drop_duplicates pass picks each key's winner. No per-key Python
    loop, no full-table sort.

    NULL contract: a NULL ``ts`` sorts as the LEAST recent (SQL ``ORDER
    BY ts DESC`` with DuckDB's default NULLS-LAST), so a NULL-ts row wins
    only when every row of its key has a NULL ts. All input columns pass
    through unchanged — including their DTYPES: the pandas kernel
    degrades an int64-with-NULL column to float64 in NULL-containing
    blocks only, so without the final cast-back stage the output schema
    would drift BETWEEN blocks of one run (hashing was already
    drift-proof via hash64's per-element canonicalization; this pins the
    declared schema too). Blocks whose plan metadata is unavailable skip
    the cast, same as before.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    try:
        _s = ds.schema(fetch_if_missing=False)
        in_schema = _s.base_schema if _s is not None else None
    except Exception:
        in_schema = None

    def _latest(df):
        if key_col not in df.columns or not len(df):
            return df
        sub = df.sort_values([key_col, ts_col, id_col], kind="mergesort",
                             na_position="first")
        return sub.drop_duplicates(subset=[key_col], keep="last")

    def _part(df):
        out = _latest(df).copy()
        if key_col not in out.columns or not len(out):
            out["part"] = pd.array([], dtype="int64")
            return out
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _final(df):
        return _latest(df).drop(columns=["part"], errors="ignore")

    res = ds.map_batches(_part, batch_format="pandas",
                         batch_size=batch_size) \
        .groupby("part").map_groups(_final, batch_format="pandas")
    if in_schema is None:
        return res

    def _cast_back(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2
        cols = {}
        for name in b.column_names:
            col = b.column(name)
            if name in in_schema.names:
                typ = in_schema.field(name).type
                if col.type != typ:
                    if pa.types.is_floating(col.type) \
                            and not pa.types.is_floating(typ):
                        # pandas spells the degraded column's NULLs NaN
                        col = pc2.if_else(
                            pc2.is_nan(col),
                            pa.scalar(None, col.type), col)
                    col = pc2.cast(col, typ)
            cols[name] = col
        return pa.table(cols)

    return res.map_batches(_cast_back, batch_format="pyarrow")


def pivot_agg(ds, *, group_col: str, pivot_col: str, value_col: str,
              values: list, batch_size: int = 65536):
    """Pivot by conditional aggregation: one ``sum_<v>`` float64 column
    per DECLARED pivot value — ``coalesce(sum(value) FILTER (WHERE
    pivot = v), 0)`` parity per output column.

    ``values`` must be declared up front: discovering them would cost an
    extra full pass at 100 TB and make the output schema
    data-dependent, which breaks streaming schema stability (Spark's
    pivot demands an explicit value list at scale for the same reason).
    Undeclared pivot values are ignored; a group with no rows for a
    declared value reports 0.0 (the SQL mirror wraps its filtered SUM in
    ``coalesce(.., 0)``); NULL measures add 0 to their cell; NULL group
    keys are dropped (SQL mirror: ``WHERE group IS NOT NULL``).

    Shape: the in-batch combiner collapses each batch to one partial row
    per group (wide but bounded: len(values) float64 cells), so only
    group-cardinality rows carry a coarse hash-partition tag into the
    single co-locating shuffle; the per-partition final is one vectorized
    multi-column groupby-sum. No stage holds more than groups x values
    cells.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    names = [f"sum_{v}" for v in values]

    def _empty():
        return pd.DataFrame({group_col: [],
                             **{n: pd.array([], dtype="float64")
                                for n in names},
                             "part": pd.array([], dtype="int64")})

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return _empty()
        pv = df[pivot_col].to_numpy()
        val = np.nan_to_num(
            df[value_col].to_numpy(dtype=np.float64, na_value=np.nan))
        tmp = pd.DataFrame({group_col: df[group_col].to_numpy(),
                            **{n: np.where(pv == v, val, 0.0)
                               for n, v in zip(names, values)}})
        g = tmp.groupby(group_col, as_index=False).sum()
        g["part"] = (hash64(g[group_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _final(df):
        if group_col not in df.columns or not len(df):
            return _empty().drop(columns=["part"])
        return df.drop(columns=["part"]) \
            .groupby(group_col, as_index=False).sum()

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_final, batch_format="pandas")


def _distinct_set_op(left, right, op: str, *, key_col: str,
                     right_key_col: str = None,
                     batch_size: int = 65536):
    """Shared kernel for :func:`except_distinct` /
    :func:`intersect_distinct` — SQL ``EXCEPT`` / ``INTERSECT`` (both
    DISTINCT by definition) over one key column.

    Shape: each side deduplicates IN-BATCH first (the combiner), so only
    per-batch-distinct (key, side) rows carry a coarse hash-partition tag
    into the single co-locating shuffle; the per-partition final is one
    vectorized groupby computing each key's side span. Nothing holds a
    global set; NULL keys are dropped (the SQL mirror filters ``key IS
    NOT NULL`` — SQL set ops would otherwise treat NULL as a value).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    rkey = right_key_col or key_col

    def _prep(col, side):
        # pure Arrow: Arrow->pandas would degrade an int64-with-NULL key
        # column to float64, flipping the OUTPUT key dtype between
        # blocks (schema-unification drift) — same rationale as
        # _distinct_keys.
        def _fn(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            k = pc.unique(b.column(col).combine_chunks().drop_null())
            h = (hash64(k.to_numpy(zero_copy_only=False))
                 % np.uint64(P)).astype(np.int64)
            return pa.table({
                key_col: k,
                "side": pa.array(np.full(len(k), side, dtype=np.int64)),
                "part": pa.array(h, pa.int64())})
        return _fn

    both = left.map_batches(_prep(key_col, 0), batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=batch_size) \
        .union(right.map_batches(_prep(rkey, 1), batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=batch_size))

    def _resolve(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: []})
        if op == "union":  # every key — no side-span aggregation needed
            return pd.DataFrame(
                {key_col: df[key_col].drop_duplicates().to_numpy()})
        g = df.drop_duplicates([key_col, "side"]) \
            .groupby(key_col)["side"].agg(["min", "max"])
        if op == "except":
            keep = g.index[(g["min"] == 0) & (g["max"] == 0)]
        elif op == "symdiff":  # exactly one side: all side tags equal
            keep = g.index[g["min"] == g["max"]]
        else:  # intersect
            keep = g.index[(g["min"] == 0) & (g["max"] == 1)]
        return pd.DataFrame({key_col: keep.to_numpy()})

    return both.groupby("part").map_groups(_resolve,
                                           batch_format="pandas")


def except_distinct(left, right, *, key_col: str,
                    right_key_col: str = None,
                    batch_size: int = 65536):
    """Distinct keys present in ``left`` but absent from ``right`` — SQL
    ``SELECT key FROM left EXCEPT SELECT key FROM right`` parity (NULL
    keys dropped; see :func:`_distinct_set_op` for the shape)."""
    return _distinct_set_op(left, right, "except", key_col=key_col,
                            right_key_col=right_key_col,
                            batch_size=batch_size)


def intersect_distinct(left, right, *, key_col: str,
                       right_key_col: str = None,
                       batch_size: int = 65536):
    """Distinct keys present in BOTH inputs — SQL ``INTERSECT`` parity
    (NULL keys dropped; see :func:`_distinct_set_op` for the shape)."""
    return _distinct_set_op(left, right, "intersect", key_col=key_col,
                            right_key_col=right_key_col,
                            batch_size=batch_size)


def union_distinct(left, right, *, key_col: str,
                   right_key_col: str = None,
                   batch_size: int = 65536):
    """Distinct keys present in EITHER input — SQL ``UNION`` parity
    (NULL keys dropped; see :func:`_distinct_set_op` for the shape)."""
    return _distinct_set_op(left, right, "union", key_col=key_col,
                            right_key_col=right_key_col,
                            batch_size=batch_size)


def symmetric_difference_distinct(left, right, *, key_col: str,
                                  right_key_col: str = None,
                                  batch_size: int = 65536):
    """Distinct keys present in EXACTLY ONE input — SQL ``(a EXCEPT b)
    UNION (b EXCEPT a)`` parity in a single pass (NULL keys dropped; see
    :func:`_distinct_set_op` for the shape — the resolve keeps keys whose
    side tags are all equal, so no second scan or union of two EXCEPT
    pipelines is needed)."""
    return _distinct_set_op(left, right, "symdiff", key_col=key_col,
                            right_key_col=right_key_col,
                            batch_size=batch_size)


def grouped_mode(ds, *, group_col: str, value_col: str,
                 batch_size: int = 65536):
    """Most frequent ``value_col`` per ``group_col``; ties break to the
    SMALLEST value (deterministic — SQL ``mode()`` leaves ties
    unspecified, so the oracle mirror is the max-count / min-value join).
    Returns (group, mode_value, n) with n = the winning count.

    Two-level shape: the in-batch combiner collapses each batch to
    (group, value, count) partial rows — distinct-pair-bounded, never raw
    rows — then whole groups co-locate on P coarse hash partitions where
    one vectorized sum + sort + drop_duplicates picks each group's
    winner. NULL values AND NULL group keys are dropped (SQL mirror:
    ``WHERE value IS NOT NULL AND group IS NOT NULL`` — pandas grouping
    would otherwise silently omit the NULL group the SQL keeps).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], value_col: [],
                                 "c": pd.array([], dtype="int64"),
                                 "part": pd.array([], dtype="int64")})
        sub = df[[group_col, value_col]].dropna()
        g = sub.groupby([group_col, value_col], as_index=False).size() \
            .rename(columns={"size": "c"})
        g["c"] = g["c"].astype(np.int64)
        g["part"] = (hash64(g[group_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _winner(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "mode_value": [],
                                 "n": pd.array([], dtype="int64")})
        tot = df.groupby([group_col, value_col], as_index=False)["c"].sum()
        w = tot.sort_values([group_col, "c", value_col],
                            ascending=[True, False, True],
                            kind="mergesort") \
            .drop_duplicates(subset=[group_col], keep="first")
        return pd.DataFrame({group_col: w[group_col].to_numpy(),
                             "mode_value": w[value_col].to_numpy(),
                             "n": w["c"].to_numpy().astype(np.int64)})

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_winner, batch_format="pandas")


def running_sum(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                val_col: str = "value", id_col: str = "event_id",
                batch_size: int = 65536):
    """Per-key cumulative sum in event order — ``coalesce(sum(value)
    OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING),
    0)`` parity. NULL contract: a NULL value contributes 0 and the row
    reports the running sum of the non-NULL values seen so far (0.0
    before any — the SQL mirror's ``coalesce(.., 0)``).

    Same coarse-partition shape as :func:`ewma`: whole keys co-locate on
    P hash partitions (only (id, key, ts, val) rows shuffle, once) and
    pandas' grouped cumsum Cython kernel runs once per partition. Returns
    (id, running_sum).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _cum(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "running_sum": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        filled = sub[val_col].fillna(0.0)
        # dropna=False: SQL PARTITION BY groups NULL keys into ONE
        # partition with real running sums — pandas' default would
        # exclude those rows and emit NaN for them.
        y = filled.groupby(sub[key_col], sort=False,
                           dropna=False).cumsum()
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "running_sum": y.to_numpy(dtype=np.float64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_cum, batch_format="pandas")


def _distinct_keys(ds, col: str, out_col: str, batch_size: int):
    """Globally distinct non-NULL values of ``col`` as a one-column
    Dataset named ``out_col`` — in-batch distinct first, then one
    co-locating shuffle with a per-partition unique. Pure Arrow so the
    key dtype survives (a pandas round-trip would degrade
    int64-with-NULLs to float64 and break the downstream hash join on a
    type mismatch)."""
    import pyarrow.compute as pc
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _p(b: pa.Table) -> pa.Table:
        k = pc.unique(b.column(col).combine_chunks().drop_null())
        h = (hash64(k.to_numpy(zero_copy_only=False))
             % np.uint64(P)).astype(np.int64)
        return pa.table({out_col: k, "part": pa.array(h, pa.int64())})

    def _d(b: pa.Table) -> pa.Table:
        if out_col not in b.column_names:  # whole-input-empty group frame
            return pa.table({out_col: pa.array([], pa.null())})
        k = pc.unique(b.column(out_col).combine_chunks())
        return pa.table({out_col: k})

    return ds.map_batches(_p, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size) \
        .groupby("part").map_groups(_d, batch_format="pyarrow")


def _exists_join(left, right, *, key_col: str, right_key_col: str,
                 anti: bool, batch_size: int, broadcast_limit: int):
    """Shared kernel for :func:`semi_join` / :func:`anti_join`."""
    import ray
    from engine.shuffle import join_partitions

    rkeys = _distinct_keys(right, right_key_col, key_col,
                           batch_size).materialize()
    n_keys = rkeys.count()

    if n_keys <= broadcast_limit:
        # key set ships ONCE via ray.put; the filter is map-only.
        vals = rkeys.to_pandas()
        keys = vals[key_col].to_numpy() \
            if key_col in vals.columns and len(vals) else \
            np.array([], dtype=np.int64)
        ref = ray.put(keys)

        class _Filter:
            def __init__(self, side, want_match):
                self._ref, self._want = side, want_match
                self._set = None

            def __call__(self, b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                if self._set is None:
                    k = ray.get(self._ref)
                    self._set = pa.array(
                        k, type=b.column(key_col).type) if len(k) \
                        else pa.array([], b.column(key_col).type)
                m = pc.is_in(b.column(key_col), value_set=self._set)
                # SQL EXISTS contract: a NULL key never matches — semi
                # drops it, anti keeps it (NOT EXISTS holds vacuously).
                m = pc.fill_null(m, False)
                return b.filter(m if self._want else pc.invert(m))

        return left.map_batches(_Filter(ref, not anti),
                                batch_format="pyarrow",
                                zero_copy_batch=True,
                                batch_size=batch_size)

    # distributed fall-through: hash join against the DEDUPED key set
    # (unique keys -> an inner join cannot multiply left rows).
    lschema = left.schema(fetch_if_missing=True)
    base = getattr(lschema, "base_schema", lschema)  # Ray wrapper or pa
    lcols = list(base.names)

    def _typed_empty():
        return pa.table({f.name: pa.array([], f.type) for f in base})

    if not anti:
        joined = left.join(rkeys, join_type="inner",
                           num_partitions=join_partitions(),
                           on=(key_col,))

        def _norm(b: pa.Table) -> pa.Table:
            if b.num_columns == 0:  # schemaless empty join partition
                return _typed_empty()
            return b.select(lcols)

        return joined.map_batches(_norm, batch_format="pyarrow")

    def _mark(df):
        df = df.copy()
        df["__m"] = np.int64(1)
        return df

    marked = rkeys.map_batches(_mark, batch_format="pandas")
    joined = left.join(marked, join_type="left_outer",
                       num_partitions=join_partitions(),
                       on=(key_col,))

    def _keep_unmatched(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if b.num_columns == 0:  # schemaless empty join partition
            return _typed_empty()
        return b.filter(pc.is_null(b.column("__m"))).select(lcols)

    return joined.map_batches(_keep_unmatched, batch_format="pyarrow")


def semi_join(left, right, *, key_col: str, right_key_col: str = None,
              batch_size: int = 65536, broadcast_limit: int = 2_000_000):
    """Row-preserving semi join: every left row whose key appears in
    ``right`` — ``WHERE EXISTS (SELECT 1 FROM right r WHERE r.k =
    l.k)`` parity (each left row at most once, all columns pass
    through; NULL left keys never match and are dropped).

    Size-gated routing (the repo's broadcast pattern): right's DISTINCT
    key set below ``broadcast_limit`` ships once via ``ray.put`` and the
    filter is a map-only vectorized ``is_in``; a larger key set falls
    through to a distributed hash join against the globally deduped keys
    (unique keys, so the inner join cannot multiply left rows).
    """
    return _exists_join(left, right, key_col=key_col,
                        right_key_col=right_key_col or key_col,
                        anti=False, batch_size=batch_size,
                        broadcast_limit=broadcast_limit)


def anti_join(left, right, *, key_col: str, right_key_col: str = None,
              batch_size: int = 65536, broadcast_limit: int = 2_000_000):
    """Row-preserving anti join: every left row whose key does NOT
    appear in ``right`` — ``WHERE NOT EXISTS`` parity. NULL left keys
    are KEPT (SQL: ``NULL = x`` is never true, so NOT EXISTS holds
    vacuously). Routing as :func:`semi_join`; the distributed path is a
    left-outer join against the deduped keys keeping NULL-marker rows.
    """
    return _exists_join(left, right, key_col=key_col,
                        right_key_col=right_key_col or key_col,
                        anti=True, batch_size=batch_size,
                        broadcast_limit=broadcast_limit)


def collect_sequence(ds, *, key_col: str = "user_id",
                     ts_col: str = "ts", val_col: str = "event_type",
                     id_col: str = "event_id", sep: str = ",",
                     batch_size: int = 65536):
    """Per-key ordered value concatenation — ``string_agg(val, sep ORDER
    BY ts, id)`` parity. The training-data "user history sequence"
    builder: a behavioral corpus keyed by user becomes one ordered token
    string per user. NULL values are skipped (SQL string_agg semantics);
    a key with only NULLs emits no row; NULL group keys are dropped (SQL
    mirror: ``WHERE key IS NOT NULL``). Returns (key, seq, n_items).

    Shape: whole keys co-locate on P coarse hash partitions (only (key,
    ts, id, val) rows shuffle, once); the per-partition final is one
    stable sort + grouped join. Contract: one KEY's sequence must fit a
    worker (same per-group bound as grouped_quantiles — at 100 TB cap
    histories upstream, e.g. keep_latest-style truncation or a time
    filter, before collecting).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [key_col, ts_col, id_col, val_col]

    def _part(df):
        out = df[cols].dropna(subset=[val_col]).copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _collect(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "seq": [],
                                 "n_items": pd.array([], dtype="int64")})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort")
        g = sub.groupby(key_col, sort=False)[val_col]
        return pd.DataFrame({
            key_col: g.agg("first").index.to_numpy(),
            "seq": g.agg(sep.join).to_numpy(),
            "n_items": g.size().to_numpy().astype(np.int64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_collect, batch_format="pandas")


def rolling_window_sum_count(ds, *, key_col: str = "user_id",
                             ts_col: str = "ts", val_col: str = "value",
                             id_col: str = "event_id",
                             window_seconds: float = 3 * 3600,
                             batch_size: int = 65536):
    """Per-key rolling SUM and non-NULL COUNT over a trailing time
    window — ``sum(value) OVER (... RANGE <w> PRECEDING)`` /
    ``count(value) OVER (...)`` parity, including tie peers and SQL NULL
    semantics (an all-NULL frame sums to NULL, counts 0). NULL-ts rows
    are dropped (see :func:`_rolling_frames`).

    Shares :func:`_rolling_frames` with :func:`rolling_window_mean`
    (whole keys per coarse partition, one searchsorted pair + prefix
    sums, no per-key loop). Returns (id, rolling_sum, rolling_n).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(df[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _roll(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "rolling_sum": [],
                                 "rolling_n": pd.array([],
                                                       dtype="int64")})
        sub, sums, cnts = _rolling_frames(
            df, key_col=key_col, ts_col=ts_col, val_col=val_col,
            id_col=id_col, window_seconds=window_seconds)
        sums = np.where(cnts > 0, sums, np.nan)  # SQL: all-NULL -> NULL
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "rolling_sum": sums,
                             "rolling_n": np.asarray(cnts,
                                                     dtype=np.int64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_roll, batch_format="pandas")


def _range_reduce(v, j, e, op, fill):
    """``op``-reduction of ``v`` over each half-open range ``[j[i],
    e[i])`` via an O(n log n) sparse table — the classic RMQ trick: any
    range is the overlap of two power-of-two blocks, so one table build
    plus two gathers answers every frame, with no per-row Python loop.
    NaNs must be pre-replaced with ``fill`` (the op's identity); empty
    ranges report ``fill``.
    """
    n = len(v)
    lens = e - j
    out = np.full(len(j), fill, dtype=np.float64)
    pos = lens > 0
    if n == 0 or not pos.any():
        return out
    K = int(lens[pos].max()).bit_length() - 1  # floor(log2(maxlen))
    st = [np.asarray(v, dtype=np.float64)]
    for k in range(1, K + 1):
        half = 1 << (k - 1)
        prev = st[-1]
        L = n - (1 << k) + 1
        if L <= 0:
            break
        st.append(op(prev[:L], prev[half:half + L]))
    ks = np.zeros(len(j), dtype=np.int64)
    ks[pos] = np.int64(np.floor(np.log2(lens[pos])))
    for k in np.unique(ks[pos]):
        sel = pos & (ks == k)
        size = 1 << int(k)
        out[sel] = op(st[int(k)][j[sel]], st[int(k)][e[sel] - size])
    return out


def rolling_window_min_max(ds, *, key_col: str = "user_id",
                           ts_col: str = "ts", val_col: str = "value",
                           id_col: str = "event_id",
                           window_seconds: float = 3 * 3600,
                           batch_size: int = 65536):
    """Per-key rolling MIN and MAX over a trailing time window —
    ``min(value) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN <w>
    PRECEDING AND CURRENT ROW)`` / ``max(...)`` parity, including tie
    peers and SQL NULL semantics (NULL values are ignored; an all-NULL
    frame reports NULL for both). NULL-ts rows are dropped and NULL keys
    group as ONE partition (see :func:`_rolling_frames`).

    Shares the frame boundaries of :func:`_rolling_frames`
    (:func:`_rolling_bounds`); the reduction itself is a sparse-table
    range min/max (:func:`_range_reduce`) because prefix sums cannot
    express min over overlapping frames — still one vectorized pass per
    coarse key partition, O(n log n) in the partition size. Returns
    (id, rolling_min, rolling_max).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(df[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _roll(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "rolling_min": [],
                                 "rolling_max": []})
        sub, v, j, e = _rolling_bounds(
            df, key_col=key_col, ts_col=ts_col, val_col=val_col,
            id_col=id_col, window_seconds=window_seconds)
        if not len(sub):
            return pd.DataFrame({id_col: [], "rolling_min": [],
                                 "rolling_max": []})
        lo = _range_reduce(np.where(np.isnan(v), np.inf, v), j, e,
                           np.minimum, np.inf)
        hi = _range_reduce(np.where(np.isnan(v), -np.inf, v), j, e,
                           np.maximum, -np.inf)
        return pd.DataFrame({
            id_col: sub[id_col].to_numpy(),
            "rolling_min": np.where(np.isfinite(lo), lo, np.nan),
            "rolling_max": np.where(np.isfinite(hi), hi, np.nan)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_roll, batch_format="pandas")


def window_ranks(ds, *, key_col: str = "user_id",
                 val_col: str = "value", id_col: str = "event_id",
                 batch_size: int = 65536):
    """Per-key ROW_NUMBER / RANK / DENSE_RANK of ``val_col`` ascending —
    exactly ``row_number() OVER (PARTITION BY key ORDER BY val ASC NULLS
    LAST, id)``, ``rank() / dense_rank() OVER (PARTITION BY key ORDER BY
    val ASC NULLS LAST)``. NULL values sort last and are PEERS of each
    other (they share a rank); NULL keys group as ONE partition, per SQL
    PARTITION BY. ``id_col`` makes row_number deterministic under value
    ties.

    Scale shape: whole keys co-locate on P coarse hash partitions and
    one vectorized pass ranks each partition — key breaks, value-run
    breaks and the three ranks all come from cumsum/maximum.accumulate
    over break flags; no per-key loop, and only (id, key, val) rows
    shuffle, once. Returns (id, row_number, rank, dense_rank).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(df[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _rank(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                id_col: [],
                "row_number": pd.array([], dtype="int64"),
                "rank": pd.array([], dtype="int64"),
                "dense_rank": pd.array([], dtype="int64")})
        sub, idx, new_key, chg, key_start, run_start = _order_breaks(
            df, key_col=key_col, val_col=val_col, id_col=id_col)
        d = np.cumsum(chg)
        return pd.DataFrame({
            id_col: sub[id_col].to_numpy(),
            "row_number": idx - key_start + 1,
            "rank": run_start - key_start + 1,
            "dense_rank": d - d[key_start] + 1})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_rank, batch_format="pandas")


def _order_breaks(df, *, key_col, val_col, id_col):
    """Shared break-flag kernel for the window-rank family: sort a
    partition by (key, val NULLS LAST, id) and return ``(sub, idx,
    new_key, chg, key_start, run_start)`` — per-row key-break and
    value-run-break flags plus each row's key/run start index, all from
    cumsum / maximum.accumulate (no per-key loop). NULL keys group as
    ONE partition and NULL values are PEERS of each other, both
    NULL-aware the same way as :func:`_rolling_bounds`."""
    import pandas as pd
    sub = df.sort_values([key_col, val_col, id_col], kind="mergesort",
                         na_position="last").reset_index(drop=True)
    n = len(sub)
    idx = np.arange(n, dtype=np.int64)
    keys = sub[key_col].to_numpy()
    knull = pd.isna(keys)
    with np.errstate(invalid="ignore"):
        kneq = keys[1:] != keys[:-1]
    new_key = np.r_[True, kneq & ~(knull[1:] & knull[:-1])]
    vals = sub[val_col].to_numpy()
    vnull = pd.isna(vals)
    with np.errstate(invalid="ignore"):
        vneq = vals[1:] != vals[:-1]
    chg = new_key | np.r_[True, vneq & ~(vnull[1:] & vnull[:-1])]
    key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
    run_start = np.maximum.accumulate(np.where(chg, idx, 0))
    return sub, idx, new_key, chg, key_start, run_start


def window_rank_fractions(ds, *, key_col: str = "user_id",
                          val_col: str = "value",
                          id_col: str = "event_id", ntile_k: int = 4,
                          batch_size: int = 65536):
    """Per-key PERCENT_RANK / CUME_DIST / NTILE of ``val_col`` ascending
    — exactly ``percent_rank() / cume_dist() OVER (PARTITION BY key
    ORDER BY val ASC NULLS LAST)`` and ``ntile(k) OVER (... , id)``
    (NTILE is row-positional, so ``id_col`` makes it deterministic under
    value ties; the two fractions are peer-based). SQL semantics
    throughout: percent_rank = (rank-1)/(n-1) (0.0 for single-row
    partitions), cume_dist = peers-through-current / n, NTILE gives the
    first ``n % k`` buckets the extra row. NULL values sort last as
    peers; NULL keys group as ONE partition.

    Same scale shape as :func:`window_ranks` (shared
    :func:`_order_breaks` pass per coarse key partition). Returns
    (id, pct_rank, cume_dist, bucket).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(df[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _fracs(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                id_col: [], "pct_rank": [], "cume_dist": [],
                "bucket": pd.array([], dtype="int64")})
        sub, idx, new_key, chg, key_start, run_start = _order_breaks(
            df, key_col=key_col, val_col=val_col, id_col=id_col)
        n = len(sub)
        key_ord = np.cumsum(new_key) - 1
        sizes = np.diff(np.r_[idx[new_key], n])
        key_n = sizes[key_ord]
        run_ord = np.cumsum(chg) - 1
        run_pos = idx[chg]
        run_end = (run_pos + np.diff(np.r_[run_pos, n]))[run_ord]
        rank = run_start - key_start + 1
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.where(key_n > 1, (rank - 1) / (key_n - 1), 0.0)
        cume = (run_end - key_start) / key_n
        rn0 = idx - key_start  # 0-based row number within key
        size, rem = key_n // ntile_k, key_n % ntile_k
        fat = rem * (size + 1)  # rows covered by the size+1 buckets
        bucket = np.where(
            rn0 < fat,
            rn0 // np.maximum(size + 1, 1),
            rem + np.where(size > 0, (rn0 - fat) // np.maximum(size, 1),
                           0)) + 1
        return pd.DataFrame({
            id_col: sub[id_col].to_numpy(),
            "pct_rank": pct,
            "cume_dist": cume,
            "bucket": bucket.astype(np.int64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_fracs, batch_format="pandas")


def running_min_max(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    val_col: str = "value", id_col: str = "event_id",
                    batch_size: int = 65536):
    """Per-key cumulative MIN and MAX in event order — ``min(value) OVER
    (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` /
    ``max(...)`` parity. SQL NULL semantics: a NULL value leaves the
    running extremes unchanged (the row still reports the extremes of the
    non-NULL values seen so far; NULL before the key's first non-NULL
    value). NULL keys group as ONE partition (``dropna=False``), the
    PARTITION BY family contract.

    Same coarse-partition shape as :func:`running_sum` (only
    (id, key, ts, val) rows shuffle, once). pandas' grouped
    cummin/cummax leave NaN at NULL input positions instead of carrying
    the running extreme, so a grouped forward-fill restores the SQL
    carry semantics — rows before the first non-NULL stay NaN, which is
    exactly SQL's NULL there. Returns (id, running_min, running_max).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _cum(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "running_min": [],
                                 "running_max": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        keys = sub[key_col]
        g = sub.groupby(keys, sort=False, dropna=False)[val_col]
        lo = g.cummin().groupby(keys, sort=False, dropna=False).ffill()
        hi = g.cummax().groupby(keys, sort=False, dropna=False).ffill()
        return pd.DataFrame({
            id_col: sub[id_col].to_numpy(),
            "running_min": lo.to_numpy(dtype=np.float64),
            "running_max": hi.to_numpy(dtype=np.float64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_cum, batch_format="pandas")


def interevent_gap_stats(ds, *, key_col: str = "user_id",
                         ts_col: str = "ts", id_col: str = "event_id",
                         batch_size: int = 65536):
    """Per-key inter-event gap statistics — the gaps are ``ts - lag(ts)
    OVER (PARTITION BY key ORDER BY ts, id)`` in seconds, aggregated per
    key as (non-NULL gap count, mean, max). Each key's first event
    contributes no gap, so a single-event key reports (0, NULL, NULL).
    NULL-ts rows are dropped before the lag (oracle mirrors
    ``ts IS NOT NULL``); NULL keys group as ONE partition.

    Same coarse-partition shape as :func:`running_sum`: only
    (id, key, ts) rows shuffle once, and both the grouped lag (shift)
    and the gap aggregate run as pandas Cython kernels per partition —
    the output is one row per key. Returns
    (key, n_gaps, avg_gap_s, max_gap_s).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col]

    def _part(df):
        out = df.loc[df[ts_col].notna(), cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _gaps(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                key_col: [], "n_gaps": pd.array([], dtype="int64"),
                "avg_gap_s": [], "max_gap_s": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        keys = sub[key_col]
        prev = sub.groupby(keys, sort=False,
                           dropna=False)[ts_col].shift(1)
        gap = (sub[ts_col] - prev).dt.total_seconds()
        g = gap.groupby(keys, sort=False, dropna=False)
        out = pd.DataFrame({"n_gaps": g.count().to_numpy(np.int64),
                            "avg_gap_s": g.mean().to_numpy(np.float64),
                            "max_gap_s": g.max().to_numpy(np.float64)})
        out.insert(0, key_col, g.count().index.to_numpy())
        return out

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_gaps, batch_format="pandas")


def delta_from_first(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                     val_col: str = "value", id_col: str = "event_id",
                     batch_size: int = 65536):
    """Per-row delta from the key's first-event value — ``value -
    FIRST_VALUE(value) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)`` parity. FIRST_VALUE is positional (SQL default
    RESPECT NULLS): if the key's first row has a NULL value every delta
    in the key is NULL, and a NULL value row is NULL regardless — both
    fall out of NaN arithmetic. NULL keys group as ONE partition; NULL
    timestamps sort last (both engines' NULLS LAST default).

    One sort + one ``maximum.accumulate`` start-index gather per coarse
    key partition — no per-key loop. Returns (id, delta_from_first).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _delta(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "delta_from_first": []})
        sub = df.sort_values([key_col, ts_col, id_col], kind="mergesort",
                             na_position="last").reset_index(drop=True)
        n = len(sub)
        idx = np.arange(n, dtype=np.int64)
        keys = sub[key_col].to_numpy()
        knull = pd.isna(keys)
        with np.errstate(invalid="ignore"):
            kneq = keys[1:] != keys[:-1]
        new_key = np.r_[True, kneq & ~(knull[1:] & knull[:-1])]
        start = np.maximum.accumulate(np.where(new_key, idx, 0))
        v = sub[val_col].to_numpy(dtype=np.float64)
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "delta_from_first": v - v[start]})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_delta, batch_format="pandas")


def grouped_zscore(ds, *, key_col: str = "user_id",
                   val_col: str = "value", id_col: str = "event_id",
                   batch_size: int = 65536):
    """Per-row z-score within its key's value distribution — ``(value -
    avg(value) OVER (PARTITION BY key)) / stddev_samp(value) OVER
    (PARTITION BY key)`` parity, with NULL when the stddev is NULL
    (single-row key) or zero (constant key — the SQL mirror's ``CASE
    WHEN std > 0``). NULL-value rows are dropped (oracle mirrors
    ``value IS NOT NULL``); NULL keys group as ONE partition.

    Same coarse-partition shape as :func:`running_sum`: (id, key, val)
    rows shuffle once and the per-key mean/std come from pandas grouped
    ``transform`` Cython kernels — one pass per partition, no per-key
    loop. Returns (id, z).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, val_col]

    def _part(df):
        out = df.loc[df[val_col].notna(), cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _z(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "z": []})
        g = df.groupby(key_col, sort=False, dropna=False)[val_col]
        mu = g.transform("mean").to_numpy(np.float64)
        sd = g.transform("std").to_numpy(np.float64)  # ddof=1, n=1 -> NaN
        v = df[val_col].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(sd > 0, (v - mu) / sd, np.nan)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "z": z})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_z, batch_format="pandas")


def grouped_minmax_scale(ds, *, key_col: str = "user_id",
                         val_col: str = "value",
                         id_col: str = "event_id",
                         batch_size: int = 65536):
    """Per-row min-max scaling within its key — ``(value - min(value)
    OVER (PARTITION BY key)) / (max(value) OVER (PARTITION BY key) -
    min(...))`` parity, NULL when the key's range is zero (constant
    key — the SQL mirror's ``CASE WHEN max > min``). NULL-value rows
    are dropped (oracle mirrors ``value IS NOT NULL``); NULL keys group
    as ONE partition.

    Same coarse-partition shape as :func:`grouped_zscore` — pandas
    grouped ``transform('min'/'max')`` Cython kernels, one pass per
    partition. Returns (id, scaled).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, val_col]

    def _part(df):
        out = df.loc[df[val_col].notna(), cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _scale(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "scaled": []})
        g = df.groupby(key_col, sort=False, dropna=False)[val_col]
        lo = g.transform("min").to_numpy(np.float64)
        hi = g.transform("max").to_numpy(np.float64)
        v = df[val_col].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            s = np.where(hi > lo, (v - lo) / (hi - lo), np.nan)
        return pd.DataFrame({id_col: df[id_col].to_numpy(), "scaled": s})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_scale, batch_format="pandas")


def user_activity_span(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                       batch_size: int = 65536):
    """Per-key activity profile: event count, DISTINCT active days
    (``count(distinct date_trunc('day', ts))``), first and last event
    timestamps. NULL-ts rows are dropped (oracle mirrors ``ts IS NOT
    NULL``); NULL keys form one output row (SQL GROUP BY).

    Scale shape: the in-batch combiner collapses each block to one row
    per (key, day) — count + min/max ride those rows, so the shuffle is
    (keys x active-days)-bounded and the DISTINCT needs no second pass:
    after the (key, day) groupby-aggregate, each key's day count is just
    its row count in the final coarse-partition pass. Returns
    (key, n_events, n_active_days, first_ts, last_ts).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "day": [],
                                 "n": pd.array([], dtype="int64"),
                                 "first_ts": pd.array([], "datetime64[us]"),
                                 "last_ts": pd.array([], "datetime64[us]")})
        sub = df.loc[df[ts_col].notna(), [key_col, ts_col]]
        g = pd.DataFrame({key_col: sub[key_col],
                          "day": sub[ts_col].dt.floor("D"),
                          "ts": sub[ts_col]}) \
            .groupby([key_col, "day"], sort=False, dropna=False).agg(
                n=("ts", "size"), first_ts=("ts", "min"),
                last_ts=("ts", "max")).reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["part"] = (hash64(g[key_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    # second-level combine of (key, day) partials BEFORE the per-key
    # reduce keeps hot keys bounded: blocks x days -> days rows per key
    def _merge(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "n_events": pd.array([], dtype="int64"),
                                 "n_active_days":
                                     pd.array([], dtype="int64"),
                                 "first_ts":
                                     pd.array([], "datetime64[us]"),
                                 "last_ts":
                                     pd.array([], "datetime64[us]")})
        byday = df.groupby([key_col, "day"], sort=False, dropna=False).agg(
            n=("n", "sum"), first_ts=("first_ts", "min"),
            last_ts=("last_ts", "max")).reset_index()
        out = byday.groupby(key_col, sort=False, dropna=False).agg(
            n_events=("n", "sum"), n_active_days=("day", "size"),
            first_ts=("first_ts", "min"),
            last_ts=("last_ts", "max")).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        out["n_active_days"] = out["n_active_days"].astype(np.int64)
        return out

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_merge, batch_format="pandas")


def q6_forecast_revenue(lineitem_ds, *, date_lo: str = "1996-01-01",
                        date_hi: str = "1997-01-01",
                        disc_lo: float = 0.05, disc_hi: float = 0.07,
                        qty_lt: float = 24.0, batch_size: int = 65536):
    """TPC-H Q6-style forecast-revenue: ``sum(l_extendedprice *
    l_discount)`` over a shipdate year, a discount band (inclusive) and
    a quantity cap — the canonical filtered scalar aggregate. Returns a
    ONE-ROW table (revenue, n_items); an empty selection reports SQL's
    (NULL, 0).

    Scale shape: pure map + tiny aggregate — each block collapses to one
    (rev, n) partial row inside ``map_batches`` (Arrow compare kernels,
    no pandas), so the only data movement is one row per block.
    """
    import pandas as pd
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _partial(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            keep = ((d >= lo) & (d < hi) & (disc >= disc_lo)
                    & (disc <= disc_hi) & (qty < qty_lt))
        keep &= ~(np.isnan(disc) | np.isnan(qty) | np.isnan(price))
        return pa.table({
            "rev": pa.array([float((price[keep] * disc[keep]).sum())],
                            pa.float64()),
            "n": pa.array([int(keep.sum())], pa.int64())})

    parts = lineitem_ds.map_batches(_partial, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=batch_size)
    # one row per block -> a scalar Sum aggregate is the intended
    # consumption (no shuffle; Ray folds partials in a tree)
    totals = parts.sum(["rev", "n"])
    n = int(totals["sum(n)"] or 0)
    rev = float(totals["sum(rev)"]) if n else None
    return pa.table({"revenue": pa.array([rev], pa.float64()),
                     "n_items": pa.array([n], pa.int64())})


def event_type_cooccurrence(ds, *, key_col: str = "user_id",
                            type_col: str = "event_type",
                            batch_size: int = 65536):
    """Market-basket co-occurrence: for every unordered pair of event
    types, the number of keys that exhibit BOTH — ``select a.t, b.t,
    count(*) from distinct(key, t) a join distinct(key, t) b on key
    and a.t < b.t group by 1, 2`` parity. NULL keys / types drop.

    Scale shape: per-batch distinct (key, type) pairs (the dictionary-
    code combiner) shuffle ONCE on key hash; within each coarse
    partition a cross-batch dedup + one vectorized self-merge expands
    pairs (bounded: a key with t distinct types yields t(t-1)/2 rows,
    and t is capped by the type vocabulary, not the corpus); the final
    (type_a, type_b) groupby is vocabulary²-bounded. Returns
    (type_a, type_b, n_keys).
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks, balance
    from ray.data.aggregate import Sum
    P = reduce_blocks()

    def _distinct(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], type_col: [], "part": []})
        sub = df[[key_col, type_col]].dropna().drop_duplicates()
        sub = sub.copy()
        sub["part"] = (hash64(sub[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return sub

    def _pairs(df):
        out_empty = pd.DataFrame({"type_a": [], "type_b": [],
                                  "n": pd.array([], dtype="int64")})
        if key_col not in df.columns or not len(df):
            return out_empty
        sub = df[[key_col, type_col]].drop_duplicates()
        m = sub.merge(sub, on=key_col, suffixes=("_a", "_b"))
        m = m[m[type_col + "_a"] < m[type_col + "_b"]]
        if not len(m):
            return out_empty
        g = m.groupby([type_col + "_a", type_col + "_b"], sort=False) \
            .size().rename("n").reset_index()
        g.columns = ["type_a", "type_b", "n"]
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_distinct, batch_format="pandas",
                           batch_size=batch_size) \
        .groupby("part").map_groups(_pairs, batch_format="pandas")
    agg = balance(parts).groupby(["type_a", "type_b"]).aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"type_a": b.column("type_a"),
                         "type_b": b.column("type_b"),
                         "n_keys": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        t = column_dtype(ds, type_col)
        return ray.data.from_arrow(pa.table(
            {"type_a": pa.array([], t), "type_b": pa.array([], t),
             "n_keys": pa.array([], pa.int64())}))
    return res


def collect_distinct_sorted(ds, *, key_col: str = "user_id",
                            val_col: str = "event_type", sep: str = ",",
                            batch_size: int = 65536):
    """Per-key DISTINCT value set as one value-sorted joined string —
    ``string_agg(DISTINCT val, sep ORDER BY val)`` parity. NULL values
    are skipped; a key with only NULLs emits no row; NULL keys are
    dropped (SQL mirror ``key IS NOT NULL``, the collect_sequence
    convention). Returns (key, vals, n_distinct).

    Scale shape: per-batch distinct (key, val) pairs are the combiner
    (duplicates die in the batch, so the shuffle is set-bounded, not
    corpus-bounded); whole keys co-locate on P coarse hash partitions
    where a cross-batch dedup + ONE sort + grouped join finishes — the
    per-key bound is the value vocabulary, far smaller than a history.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _distinct(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], val_col: [], "part": []})
        sub = df[[key_col, val_col]].dropna().drop_duplicates().copy()
        sub["part"] = (hash64(sub[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return sub

    def _collect(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "vals": [],
                                 "n_distinct": pd.array([],
                                                        dtype="int64")})
        sub = df[[key_col, val_col]].drop_duplicates() \
            .sort_values([key_col, val_col], kind="mergesort")
        g = sub.groupby(key_col, sort=False)[val_col]
        return pd.DataFrame({
            key_col: g.agg("first").index.to_numpy(),
            "vals": g.agg(sep.join).to_numpy(),
            "n_distinct": g.size().to_numpy().astype(np.int64)})

    return ds.map_batches(_distinct, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_collect, batch_format="pandas")


def dense_daily_counts(ds, *, ts_col: str = "ts",
                       batch_size: int = 65536):
    """Gap-filled daily event counts — every calendar day between the
    corpus min and max day appears, zero-days included (``generate_series
    LEFT JOIN`` parity). NULL-ts rows drop. Returns (day, n).

    Scale shape: per-batch day-count combiners bound the shuffle at
    days x blocks tiny rows; the dense reindex runs worker-side over ONE
    coalesced block (the aggregate is days-bounded — a century is ~37k
    rows), never on the driver.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if ts_col not in df.columns or not len(df):
            return pd.DataFrame({"day": pd.array([], "datetime64[us]"),
                                 "n": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna(), [ts_col]]
        g = sub[ts_col].dt.floor("D").value_counts().sort_index()
        return pd.DataFrame({"day": g.index.to_numpy(),
                             "n": g.to_numpy(np.int64)})

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby("day").aggregate(Sum("n"))

    def _dense(df):
        if "day" not in df.columns or not len(df):
            return pd.DataFrame({"day": pd.array([], "datetime64[us]"),
                                 "n": pd.array([], dtype="int64")})
        df = df.sort_values("day")
        cal = pd.date_range(df["day"].iloc[0], df["day"].iloc[-1],
                            freq="D")
        s = df.set_index("day")["sum(n)"].reindex(cal, fill_value=0)
        # date_range yields ns-resolution; the corpus (and the SQL
        # mirror) are us — pin the output resolution to match
        return pd.DataFrame({
            "day": s.index.to_numpy().astype("datetime64[us]"),
            "n": s.to_numpy(np.int64)})

    res = agg.repartition(1).map_batches(
        _dense, batch_format="pandas", batch_size=None).materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"day": pa.array([], pa.timestamp("us")),
             "n": pa.array([], pa.int64())}))
    return res


def session_duration_stats(ds, *, key_col: str = "user_id",
                           ts_col: str = "ts",
                           gap_seconds: float = 30 * 60,
                           batch_size: int = 65536):
    """Per-key session-duration profile under a gap-based sessionizer:
    session count, mean and max session duration in seconds (a
    single-event session lasts 0). Sessions break when consecutive
    events are more than ``gap_seconds`` apart — tie timestamps always
    share a session, so the stats are tie-order invariant. NULL keys /
    NULL timestamps drop (oracle mirrors IS NOT NULL). Returns
    (key, n_sessions, avg_session_s, max_session_s).

    Scale shape: whole keys co-locate on P coarse hash partitions (only
    (key, ts) rows shuffle once); session ids come from one sort +
    boundary cumsum, durations from a grouped min/max — no per-key
    loop.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _part(df):
        out = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _stats(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                key_col: [],
                "n_sessions": pd.array([], dtype="int64"),
                "avg_session_s": [], "max_session_s": []})
        sub = df.sort_values([key_col, ts_col],
                             kind="mergesort").reset_index(drop=True)
        keys = sub[key_col].to_numpy()
        ts = sub[ts_col].to_numpy()
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        gap = np.r_[np.timedelta64(0, "s"), np.diff(ts)] \
            > np.timedelta64(int(gap_seconds * 1e6), "us")
        sid = np.cumsum(new_key | gap)  # global session ordinal
        f = pd.DataFrame({key_col: keys, "sid": sid, "ts": sub[ts_col]})
        per = f.groupby("sid", sort=False).agg(
            k=(key_col, "first"), lo=("ts", "min"), hi=("ts", "max"))
        dur = (per["hi"] - per["lo"]).dt.total_seconds()
        g = dur.groupby(per["k"], sort=False)
        out = pd.DataFrame({
            "n_sessions": g.size().to_numpy(np.int64),
            "avg_session_s": g.mean().to_numpy(np.float64),
            "max_session_s": g.max().to_numpy(np.float64)})
        out.insert(0, key_col, g.size().index.to_numpy())
        return out

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_stats, batch_format="pandas")


def rollup_counts(ds, *, group_col: str = "event_type",
                  ts_col: str = "ts", batch_size: int = 65536):
    """GROUPING SETS rollup of event counts over (group, day):
    ``GROUP BY GROUPING SETS ((g, day), (g), (day), ())`` parity with
    ``lvl = grouping_id(g, day)`` (0=fine, 1=per-group, 2=per-day,
    3=grand total). NULL groups / NULL ts drop; the day is reported as
    a 'YYYY-MM-DD' string (NULL at the coarser grains). Returns
    (lvl, group, day, n).

    Scale shape: ONE corpus pass builds the fine (group, day) contingency
    (in-batch combiner, bounded by groups x days); every coarser grain
    derives from that bounded aggregate with small worker-side groupbys
    and a union — the corpus is never re-read or re-shuffled per grain.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if group_col not in df.columns or not len(df):
            return pd.DataFrame({group_col: [], "day": [],
                                 "n": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[group_col].notna(),
                     [group_col, ts_col]]
        # np.datetime_as_string on day resolution == strftime('%Y-%m-%d')
        # but vectorized (strftime formats row-by-row — measured 2x on
        # the 1M-row events pass)
        g = pd.DataFrame({
            group_col: sub[group_col],
            "day": np.datetime_as_string(
                sub[ts_col].to_numpy().astype("datetime64[D]"))}) \
            .groupby([group_col, "day"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    fine = balance(ds.map_batches(_partial, batch_format="pandas",
                                  batch_size=batch_size)) \
        .groupby([group_col, "day"]).aggregate(Sum("n")).materialize()

    def _typed(lvl, g, day, n):
        return pa.table({
            "lvl": pa.array(lvl, pa.int64()),
            group_col: pa.array(g, pa.string()),
            "day": pa.array(day, pa.string()),
            "n": pa.array(n, pa.int64())})

    if fine.count() == 0:
        return ray.data.from_arrow(_typed([], [], [], []))

    def _lvl0(b: pa.Table) -> pa.Table:
        return _typed([0] * b.num_rows,
                      b.column(group_col).to_pylist(),
                      b.column("day").to_pylist(),
                      b.column("sum(n)").to_pylist())

    def _lvl1(b: pa.Table) -> pa.Table:
        return _typed([1] * b.num_rows,
                      b.column(group_col).to_pylist(),
                      [None] * b.num_rows,
                      b.column("sum(sum(n))").to_pylist())

    def _lvl2(b: pa.Table) -> pa.Table:
        return _typed([2] * b.num_rows, [None] * b.num_rows,
                      b.column("day").to_pylist(),
                      b.column("sum(sum(n))").to_pylist())

    full = fine.map_batches(_lvl0, batch_format="pyarrow")
    by_g = fine.groupby(group_col).aggregate(Sum("sum(n)")) \
        .map_batches(_lvl1, batch_format="pyarrow")
    by_d = fine.groupby("day").aggregate(Sum("sum(n)")) \
        .map_batches(_lvl2, batch_format="pyarrow")
    total = ray.data.from_arrow(_typed(
        [3], [None], [None], [int(fine.sum("sum(n)"))]))
    return full.union(by_g).union(by_d).union(total)


def activity_heatmap(ds, *, ts_col: str = "ts",
                     batch_size: int = 65536):
    """Day-of-week x hour-of-day event counts — the calendar heatmap
    (dow 0=Sunday..6, DuckDB ``dayofweek`` parity; pandas Monday-based
    weekday is shifted to match). NULL-ts rows drop. Returns
    (dow, hod, n), only non-empty cells (at most 168 rows).

    Scale shape: per-batch 2-key combiner -> a 168-cell groupby-sum; the
    corpus never shuffles.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if ts_col not in df.columns or not len(df):
            return pd.DataFrame({"dow": pd.array([], dtype="int64"),
                                 "hod": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna(), [ts_col]]
        g = pd.DataFrame({
            "dow": ((sub[ts_col].dt.dayofweek + 1) % 7).astype(np.int64),
            "hod": sub[ts_col].dt.hour.astype(np.int64)}) \
            .groupby(["dow", "hod"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(["dow", "hod"]).aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"dow": b.column("dow"), "hod": b.column("hod"),
                         "n": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"dow": pa.array([], pa.int64()),
             "hod": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}))
    return res


def user_hour_entropy(ds, *, key_col: str = "user_id",
                      ts_col: str = "ts", batch_size: int = 65536):
    """Per-key Shannon entropy (nats) of the hour-of-day activity
    distribution — the behavioral-regularity feature (a bot posting
    every hour scores ln(24); a 9-to-5 human scores much lower). NULL
    keys / NULL ts drop. Returns (key, hour_entropy, n_events).

    Scale shape: the per-batch (key, hour) count combiner bounds the
    shuffle at 24 rows per key per block; the per-key entropy reduce
    (cross-batch cell merge + p·ln p bincount) runs once per coarse
    hash partition.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "hod": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64"),
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]]
        g = pd.DataFrame({key_col: sub[key_col],
                          "hod": sub[ts_col].dt.hour.astype(np.int64)}) \
            .groupby([key_col, "hod"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["part"] = (hash64(g[key_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _entropy(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "hour_entropy": [],
                                 "n_events": pd.array([],
                                                      dtype="int64")})
        cells = df.groupby([key_col, "hod"], sort=False)["n"].sum() \
            .reset_index()
        tot = cells.groupby(key_col, sort=False)["n"].transform("sum") \
            .to_numpy(np.float64)
        p = cells["n"].to_numpy(np.float64) / tot
        ent = pd.Series(-p * np.log(p)) \
            .groupby(cells[key_col], sort=False)
        out = pd.DataFrame({
            "hour_entropy": ent.sum().to_numpy(np.float64),
            "n_events": cells.groupby(key_col, sort=False)["n"].sum()
            .to_numpy(np.int64)})
        out.insert(0, key_col, ent.sum().index.to_numpy())
        return out

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_entropy, batch_format="pandas")


def cohort_retention(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                     batch_size: int = 65536):
    """Cohort retention counts: users grouped by FIRST-active day
    (cohort), distinct active users per (cohort, day offset) — the
    classic retention triangle. NULL keys / ts drop. Returns
    (cohort 'YYYY-MM-DD', day_offset, n_users).

    Scale shape: per-batch distinct (key, day) pairs shuffle ONCE on key
    hash; inside each coarse partition the cohort (min day) and the
    per-(cohort, offset) counts resolve vectorized — a user's rows all
    co-locate, so "distinct users" is exact without a second distinct
    pass; only (cohort, offset, n) partials feed the final bounded
    groupby.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks, balance
    P = reduce_blocks()

    def _days(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "day": pd.array([], "datetime64[us]"),
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]]
        g = pd.DataFrame({key_col: sub[key_col],
                          "day": sub[ts_col].dt.floor("D")}) \
            .drop_duplicates()
        g["part"] = (hash64(g[key_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({"cohort": [],
                                 "day_offset": pd.array([],
                                                        dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        sub = df[[key_col, "day"]].drop_duplicates()
        cohort = sub.groupby(key_col, sort=False)["day"] \
            .transform("min")
        off = (sub["day"] - cohort).dt.days.astype(np.int64)
        g = pd.DataFrame({
            "cohort": cohort.dt.strftime("%Y-%m-%d"),
            "day_offset": off}) \
            .groupby(["cohort", "day_offset"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_days, batch_format="pandas",
                           batch_size=batch_size) \
        .groupby("part").map_groups(_partial, batch_format="pandas")
    agg = balance(parts).groupby(["cohort", "day_offset"]) \
        .aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"cohort": b.column("cohort"),
                         "day_offset": b.column("day_offset"),
                         "n_users": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        return ray.data.from_arrow(pa.table(
            {"cohort": pa.array([], pa.string()),
             "day_offset": pa.array([], pa.int64()),
             "n_users": pa.array([], pa.int64())}))
    return res


def rolling_rows_mean(ds, *, key_col: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      id_col: str = "event_id", window_rows: int = 3,
                      batch_size: int = 65536):
    """Per-key trailing ROWS-frame mean — ``avg(value) OVER (PARTITION
    BY key ORDER BY ts, id ROWS BETWEEN <w-1> PRECEDING AND CURRENT
    ROW)`` parity: the frame counts ROWS (NULL-value rows occupy a slot
    but don't contribute; an all-NULL frame is NULL). NULL keys group
    as ONE partition; NULL timestamps sort last. The RANGE-frame (time
    window) sibling is :func:`rolling_window_mean`. Returns
    (id, rolling_mean).

    Same coarse-partition shape as :func:`running_sum`; the kernel is
    pandas' grouped ``rolling(w, min_periods=1).mean()`` Cython path.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, val_col]

    def _part(df):
        out = df[cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _roll(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({id_col: [], "rolling_mean": []})
        sub = df.sort_values([key_col, ts_col, id_col], kind="mergesort",
                             na_position="last").reset_index(drop=True)
        y = sub.groupby(key_col, sort=False, dropna=False)[val_col] \
            .rolling(window_rows, min_periods=1).mean() \
            .reset_index(drop=True)
        # groupby.rolling returns rows in group order; groups preserve
        # the sorted order here because the frame is already sorted by
        # key, so positional alignment holds
        return pd.DataFrame({id_col: sub[id_col].to_numpy(),
                             "rolling_mean":
                                 y.to_numpy(dtype=np.float64)})

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_roll, batch_format="pandas")


def q10_returned_item_reporting(lineitem_ds, orders_ds, customer_ds,
                                nation_ds, *,
                                date_lo: str = "1996-01-01",
                                date_hi: str = "1996-04-01", k: int = 20,
                                batch_size: int = 65536,
                                concurrency=None,
                                broadcast_limit: int = 2_000_000):
    """TPC-H Q10 shape: top-k customers by revenue lost to RETURNED
    items in one quarter, enriched with account balance and nation.

    Scale shape — ONE data-data hash join, every dimension size-gated:

    1. lineitem filters ``l_returnflag = 'R'`` and pre-aggregates
       revenue per orderkey INSIDE ``map_batches`` (combiner rows, never
       raw lineitem);
    2. orders filter to the quarter and carry only (orderkey, custkey);
    3. ``Dataset.join`` on orderkey, then a custkey groupby-sum bounds
       the result at the customer count;
    4. the customer dimension attaches via a sorted-array broadcast
       (``ray.put`` + searchsorted) below ``broadcast_limit`` rows, a
       distributed hash join above; nation (25 rows) always broadcasts;
    5. distributed sort + limit keeps all but k rows off the driver.

    Returns a pandas DataFrame
    (c_custkey, c_name, revenue, c_acctbal, n_name).
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum
    from engine.shuffle import join_partitions
    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    def _li_partial(b: pa.Table) -> pa.Table:
        sub = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = (sub.column("l_extendedprice").to_numpy(zero_copy_only=False)
               * (1.0 - sub.column("l_discount").to_numpy(
                   zero_copy_only=False)))
        df = pd.DataFrame({
            "o_orderkey": sub.column("l_orderkey").to_numpy(
                zero_copy_only=False),
            "rev": rev}).groupby("o_orderkey", sort=False) \
            .sum().reset_index()
        return pa.table({"o_orderkey": pa.array(df["o_orderkey"]),
                         "rev": pa.array(df["rev"], pa.float64())})

    li = lineitem_ds.map_batches(_li_partial, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=batch_size,
                                 concurrency=concurrency)

    def _o_filter(b: pa.Table) -> pa.Table:
        od = pc.cast(b.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)
        sub = b.filter(pa.array((od >= lo) & (od < hi)))
        return pa.table({"o_orderkey": sub.column("o_orderkey"),
                         "o_custkey": sub.column("o_custkey")})

    orders = orders_ds.map_batches(_o_filter, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=batch_size,
                                   concurrency=concurrency)
    joined = li.join(orders, join_type="inner",
                     num_partitions=join_partitions(),
                     on=("o_orderkey",))

    def _norm(b: pa.Table) -> pa.Table:
        if b.num_columns == 0:  # schemaless empty join partition
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        return b.select(["o_custkey", "rev"])

    per_cust = joined.map_batches(_norm, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("rev"))

    nat = nation_ds.to_pandas()  # 25 rows by spec — always broadcast
    nat_map = dict(zip(nat["n_nationkey"].tolist(),
                       nat["n_name"].tolist()))
    cust = customer_ds.map_batches(
        lambda b: b.select(["c_custkey", "c_name", "c_acctbal",
                            "c_nationkey"]),
        batch_format="pyarrow").materialize()

    def _typed_empty():
        return pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "revenue": pa.array([], pa.float64()),
            "c_acctbal": pa.array([], pa.float64()),
            "n_name": pa.array([], pa.string())})

    if cust.count() <= broadcast_limit:
        cdf = cust.to_pandas().sort_values("c_custkey")
        side = ray.put((cdf["c_custkey"].to_numpy(),
                        cdf["c_name"].to_numpy(object),
                        cdf["c_acctbal"].to_numpy(np.float64),
                        cdf["c_nationkey"].to_numpy(), nat_map))

        def _attach(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or not b.num_rows:
                return _typed_empty()
            keys, names, bal, nk, nm = ray.get(side)
            ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, ck)
            pos = np.minimum(pos, len(keys) - 1)
            ok = keys[pos] == ck
            rev = b.column("sum(rev)").to_numpy(zero_copy_only=False)[ok]
            p = pos[ok]
            return pa.table({
                "c_custkey": pa.array(ck[ok]),
                "c_name": pa.array(names[p].tolist(), pa.string()),
                "revenue": pa.array(rev, pa.float64()),
                "c_acctbal": pa.array(bal[p], pa.float64()),
                "n_name": pa.array([nm.get(x) for x in nk[p].tolist()],
                                   pa.string())})

        enriched = per_cust.map_batches(_attach, batch_format="pyarrow")
    else:
        cj = per_cust.join(
            cust.map_batches(
                lambda b: b.rename_columns(
                    ["o_custkey", "c_name", "c_acctbal", "c_nationkey"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=join_partitions(),
            on=("o_custkey",))

        def _attach_joined(b: pa.Table) -> pa.Table:
            if b.num_columns == 0 or not b.num_rows:
                return _typed_empty()
            nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
            return pa.table({
                "c_custkey": b.column("o_custkey"),
                "c_name": b.column("c_name"),
                "revenue": pc.cast(b.column("sum(rev)"), pa.float64()),
                "c_acctbal": pc.cast(b.column("c_acctbal"), pa.float64()),
                "n_name": pa.array([nat_map.get(x) for x in nk.tolist()],
                                   pa.string())})

        enriched = cj.map_batches(_attach_joined, batch_format="pyarrow")

    top = enriched.sort(["revenue", "c_custkey"],
                        descending=[True, False]).limit(k)
    out = top.to_pandas().reset_index(drop=True)
    if not len(out):
        return _typed_empty().to_pandas()
    return out


def event_transition_matrix(ds, *, key_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            id_col: str = "event_id",
                            batch_size: int = 65536):
    """First-order Markov transition counts: how often event type A is
    immediately followed by type B within the same key's (ts, id)
    order — ``lead(type) OVER (PARTITION BY key ORDER BY ts, id)``
    pair counts. NULL keys / ts / types drop. Returns
    (from_type, to_type, n), vocabulary²-bounded.

    Scale shape: (id, key, ts, type) rows shuffle once onto P coarse
    hash partitions; adjacency is a grouped ``shift(-1)`` and the pair
    counts collapse per partition before the tiny final groupby.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks, balance
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, type_col]

    def _part(df):
        out = df.loc[df[ts_col].notna() & df[key_col].notna()
                     & df[type_col].notna(), cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _pairs(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({"from_type": [], "to_type": [],
                                 "n": pd.array([], dtype="int64")})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        nxt = sub.groupby(key_col, sort=False)[type_col].shift(-1)
        keep = nxt.notna()
        g = pd.DataFrame({"from_type": sub.loc[keep, type_col],
                          "to_type": nxt[keep]}) \
            .groupby(["from_type", "to_type"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ds.map_batches(_part, batch_format="pandas",
                           batch_size=batch_size) \
        .groupby("part").map_groups(_pairs, batch_format="pandas")
    agg = balance(parts).groupby(["from_type", "to_type"]) \
        .aggregate(Sum("n"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"from_type": b.column("from_type"),
                         "to_type": b.column("to_type"),
                         "n": b.column("sum(n)")})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        t = column_dtype(ds, type_col)
        return ray.data.from_arrow(pa.table(
            {"from_type": pa.array([], t), "to_type": pa.array([], t),
             "n": pa.array([], pa.int64())}))
    return res


# far-future sentinel for "target never seen"; must stay representable
# in ns resolution too (pandas ns max is 2262) since from_pandas inputs
# carry datetime64[ns]
_FAR_FUTURE = np.datetime64("2260-01-01", "us")


def time_to_first_target(ds, *, key_col: str = "user_id",
                         ts_col: str = "ts",
                         type_col: str = "event_type",
                         target: str = "purchase",
                         batch_size: int = 65536):
    """Per-key seconds from the FIRST event to the FIRST ``target``
    event — the time-to-conversion funnel metric; keys that never reach
    the target report NULL (SQL LEFT JOIN). NULL keys / ts drop.
    Returns (key, seconds_to_target).

    Scale shape: pure two-level MIN — each block collapses to one
    (key, min ts, min target-ts) combiner row, the groupby is
    key-bounded, and no co-location or sort is needed (min is
    associative).
    """
    import pandas as pd
    from ray.data.aggregate import Min
    from engine.shuffle import balance

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                key_col: [],
                "first_ts": pd.array([], "datetime64[us]"),
                "first_target": pd.array([], "datetime64[us]")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col, type_col]]
        g = sub.groupby(key_col, sort=False).agg(
            first_ts=(ts_col, "min")).reset_index()
        tgt = sub.loc[sub[type_col] == target] \
            .groupby(key_col, sort=False).agg(
                first_target=(ts_col, "min")).reset_index()
        out = g.merge(tgt, on=key_col, how="left")
        # never-seen targets ride as a far-future SENTINEL, not NaT:
        # a NaT/null partial poisons the cross-block Min (observed —
        # ignore_nulls is not reliable across pandas-block partials)
        out["first_target"] = out["first_target"].fillna(_FAR_FUTURE)
        return out

    parts = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=batch_size)
    agg = balance(parts).groupby(key_col).aggregate(
        Min("first_ts"), Min("first_target"))

    def _final(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "seconds_to_target": []})
        ft = df["min(first_target)"]
        delta = (ft - df["min(first_ts)"]).dt.total_seconds() \
            .to_numpy(np.float64)
        delta[ft.to_numpy() >= _FAR_FUTURE] = np.nan  # never converted
        return pd.DataFrame({key_col: df[key_col].to_numpy(),
                             "seconds_to_target": delta})

    res = agg.map_batches(_final, batch_format="pandas").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], column_dtype(ds, key_col)),
             "seconds_to_target": pa.array([], pa.float64())}))
    return res


def daily_active_users(ds, *, key_col: str = "user_id",
                       ts_col: str = "ts", batch_size: int = 65536):
    """Daily active users — distinct keys per calendar day (the DAU
    time series). NULL keys / ts drop. Returns (day 'YYYY-MM-DD', dau).

    Scale shape: per-batch DISTINCT (day, key) pairs are the combiner;
    pairs shuffle ONCE on day hash and each day's cross-batch dedup +
    count happens in its partition — the distinct-set itself never
    re-shuffles.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _pairs(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({"day": [], key_col: [],
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]]
        g = pd.DataFrame({
            "day": np.datetime_as_string(
                sub[ts_col].to_numpy().astype("datetime64[D]")),
            key_col: sub[key_col]}).drop_duplicates()
        g["part"] = (hash64(g["day"].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _count(df):
        if "day" not in df.columns or not len(df):
            return pd.DataFrame({"day": [],
                                 "dau": pd.array([], dtype="int64")})
        g = df[["day", key_col]].drop_duplicates() \
            .groupby("day", sort=False).size().rename("dau") \
            .reset_index()
        g["dau"] = g["dau"].astype(np.int64)
        return g

    return ds.map_batches(_pairs, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_count, batch_format="pandas")


def peak_hourly_rate(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                     batch_size: int = 65536):
    """Per-key burst detector: the maximum events in any single clock
    hour — ``max`` over per-(key, hour-bucket) counts. NULL keys / ts
    drop. Returns (key, peak_events_per_hour).

    Scale shape: the (key, hour) count combiner bounds the shuffle; the
    cross-batch cell merge + per-key max run once per coarse key
    partition.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _cells(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "hour": pd.array([], "datetime64[us]"),
                                 "n": pd.array([], dtype="int64"),
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]]
        g = pd.DataFrame({key_col: sub[key_col],
                          "hour": sub[ts_col].dt.floor("h")}) \
            .groupby([key_col, "hour"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["part"] = (hash64(g[key_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _peak(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "peak_events_per_hour":
                                     pd.array([], dtype="int64")})
        cells = df.groupby([key_col, "hour"], sort=False)["n"].sum() \
            .reset_index()
        g = cells.groupby(key_col, sort=False)["n"].max()
        return pd.DataFrame({
            key_col: g.index.to_numpy(),
            "peak_events_per_hour": g.to_numpy(np.int64)})

    return ds.map_batches(_cells, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_peak, batch_format="pandas")


def orders_per_customer_histogram(orders_ds, customer_ds, *,
                                  fk_col: str = "o_custkey",
                                  pk_col: str = "c_custkey",
                                  batch_size: int = 65536):
    """Distribution of per-customer order counts INCLUDING the zero
    bin — ``LEFT JOIN + COALESCE(n, 0)`` parity, the classic
    zero-inflated engagement histogram. Returns
    (n_orders, n_customers).

    Scale shape: per-key counts come from the combiner + key groupby;
    a semi-join against the dimension keys drops DANGLING foreign keys
    (they must not masquerade as customers — the corpus has them, see
    referential_orders); the histogram over the surviving counts is
    count-of-counts, and the zero bin is arithmetic — total customers
    minus customers with >= 1 order — so no anti-join ships rows.
    """
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum
    from engine.shuffle import balance

    def _partial(df):
        if fk_col not in df.columns or not len(df):
            return pd.DataFrame({fk_col: [],
                                 "n": pd.array([], dtype="int64")})
        sub = df.loc[df[fk_col].notna(), [fk_col]]
        g = sub.groupby(fk_col, sort=False).size().rename("n") \
            .reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    per_key = balance(orders_ds.map_batches(
        _partial, batch_format="pandas", batch_size=batch_size)) \
        .groupby(fk_col).aggregate(Sum("n"))
    per_key = semi_join(per_key, customer_ds, key_col=fk_col,
                        right_key_col=pk_col)

    def _coc(df):
        if not len(df) or "sum(n)" not in df.columns:
            return pd.DataFrame({"n_orders": pd.array([], dtype="int64"),
                                 "cnt": pd.array([], dtype="int64")})
        g = df.groupby("sum(n)", sort=False).size().rename("cnt") \
            .reset_index()
        g.columns = ["n_orders", "cnt"]
        g["n_orders"] = g["n_orders"].astype(np.int64)
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    per_key = per_key.materialize()
    n_with_orders = per_key.count()
    total_customers = customer_ds.count()
    hist = balance(per_key.map_batches(
        _coc, batch_format="pandas", batch_size=None)) \
        .groupby("n_orders").aggregate(Sum("cnt"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({"n_orders": b.column("n_orders"),
                         "n_customers": b.column("sum(cnt)")})

    res = hist.map_batches(_final, batch_format="pyarrow").materialize()
    zero = int(total_customers - n_with_orders)
    zero_tbl = pa.table({"n_orders": pa.array([0], pa.int64()),
                         "n_customers": pa.array([zero], pa.int64())})
    if res.count() == 0:
        return ray.data.from_arrow(zero_tbl) if zero > 0 else \
            ray.data.from_arrow(zero_tbl.slice(0, 0))
    if zero > 0:
        res = res.union(ray.data.from_arrow(zero_tbl))
    return res


def share_within_group(ds, *, outer_col: str, inner_col: str,
                       batch_size: int = 65536):
    """Normalized composition: counts per (outer, inner) plus each
    cell's SHARE of its outer group — ``n / sum(n) OVER (PARTITION BY
    outer)`` parity. NULL members drop. Returns
    (outer, inner, n, share).

    Scale shape: the two-key count combiner bounds the shuffle; the
    share transform runs per coarse OUTER-hash partition over the
    (outer x inner)-bounded aggregate — cheap by construction.
    """
    import pandas as pd
    from ray.data.aggregate import Sum
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks, balance
    P = reduce_blocks()

    def _partial(df):
        if outer_col not in df.columns or not len(df):
            return pd.DataFrame({outer_col: [], inner_col: [],
                                 "n": pd.array([], dtype="int64")})
        sub = df[[outer_col, inner_col]].dropna()
        g = sub.groupby([outer_col, inner_col], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = balance(ds.map_batches(_partial, batch_format="pandas",
                                 batch_size=batch_size)) \
        .groupby([outer_col, inner_col]).aggregate(Sum("n"))

    def _part(df):
        if outer_col not in df.columns or not len(df):
            return pd.DataFrame({outer_col: [], inner_col: [],
                                 "sum(n)": pd.array([], dtype="int64"),
                                 "part": pd.array([], dtype="int64")})
        out = df.copy()
        out["part"] = (hash64(out[outer_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _share(df):
        if outer_col not in df.columns or not len(df):
            return pd.DataFrame({outer_col: [], inner_col: [],
                                 "n": pd.array([], dtype="int64"),
                                 "share": []})
        n = df["sum(n)"].to_numpy(np.float64)
        tot = df.groupby(outer_col, sort=False)["sum(n)"] \
            .transform("sum").to_numpy(np.float64)
        return pd.DataFrame({outer_col: df[outer_col].to_numpy(),
                             inner_col: df[inner_col].to_numpy(),
                             "n": n.astype(np.int64),
                             "share": n / tot})

    return agg.map_batches(_part, batch_format="pandas") \
        .groupby("part").map_groups(_share, batch_format="pandas")


def user_repeat_rate(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id",
                     batch_size: int = 65536):
    """Per-key behavioral stickiness: the fraction of consecutive event
    pairs with the SAME type — ``count(next = type) /
    count(transitions)`` under the (ts, id) order; single-event keys
    report (0, NULL). NULL keys / ts / types drop. Returns
    (key, n_transitions, repeat_rate).

    Same key-partition adjacency as :func:`event_transition_matrix`,
    reduced per key instead of per pair.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()
    cols = [id_col, key_col, ts_col, type_col]

    def _part(df):
        out = df.loc[df[ts_col].notna() & df[key_col].notna()
                     & df[type_col].notna(), cols].copy()
        out["part"] = (hash64(out[key_col].to_numpy())
                       % np.uint64(P)).astype(np.int64)
        return out

    def _rate(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                key_col: [],
                "n_transitions": pd.array([], dtype="int64"),
                "repeat_rate": []})
        sub = df.sort_values([key_col, ts_col, id_col],
                             kind="mergesort").reset_index(drop=True)
        nxt = sub.groupby(key_col, sort=False)[type_col].shift(-1)
        has = nxt.notna()
        rep = has & (nxt == sub[type_col])
        f = pd.DataFrame({"t": has.astype(np.int64),
                          "r": rep.astype(np.int64)})
        g = f.groupby(sub[key_col], sort=False).sum()
        t = g["t"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            rate = np.where(t > 0, g["r"].to_numpy(np.float64) / t,
                            np.nan)
        out = pd.DataFrame({"n_transitions":
                            g["t"].to_numpy(np.int64),
                            "repeat_rate": rate})
        out.insert(0, key_col, g.index.to_numpy())
        return out

    return ds.map_batches(_part, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_rate, batch_format="pandas")


def user_value_concentration(ds, *, key_col: str = "user_id",
                             val_col: str = "value",
                             batch_size: int = 65536):
    """Per-key value concentration: the single largest value's share of
    the key's total — ``max(v) / NULLIF(sum(v), 0)``. NULL keys /
    values drop. Returns (key, max_share).

    Pure two-level associative aggregate (max and sum both combine):
    one (key, max, sum) combiner row per block, key-bounded groupby, no
    co-location or sort.
    """
    import pandas as pd
    from ray.data.aggregate import Max, Sum
    from engine.shuffle import balance

    def _partial(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [], "mx": [], "s": []})
        sub = df[[key_col, val_col]].dropna()
        g = sub.groupby(key_col, sort=False)[val_col] \
            .agg(["max", "sum"]).reset_index()
        g.columns = [key_col, "mx", "s"]
        return g

    agg = balance(ds.map_batches(_partial, batch_format="pandas",
                                 batch_size=batch_size)) \
        .groupby(key_col).aggregate(Max("mx"), Sum("s"))

    def _final(b: pa.Table) -> pa.Table:
        mx = b.column("max(mx)").to_numpy(zero_copy_only=False)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            share = np.where(s != 0.0, mx / s, np.nan)
        return pa.table({
            key_col: b.column(key_col),
            "max_share": pa.array([None if np.isnan(x) else float(x)
                                   for x in share], pa.float64())})

    res = agg.map_batches(_final, batch_format="pyarrow").materialize()
    if res.count() == 0:
        import ray.data
        from engine.shuffle import column_dtype
        return ray.data.from_arrow(pa.table(
            {key_col: pa.array([], column_dtype(ds, key_col)),
             "max_share": pa.array([], pa.float64())}))
    return res


def daily_ratio(ds, *, ts_col: str = "ts", type_col: str = "event_type",
                num_type: str = "purchase", den_type: str = "click",
                batch_size: int = 65536):
    """Daily ratio of two event types — ``count(num) / NULLIF(
    count(den), 0)`` per calendar day (the conversion-rate time
    series). Days where neither type occurs emit no row; a day with
    numerators but no denominators reports NULL. NULL ts/type drop.
    Returns (day 'YYYY-MM-DD', n_num, n_den, ratio).

    Scale shape: one (day, type) count combiner; the two series align
    inside the day's coarse partition — no join, no pivot shuffle.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _partial(df):
        if type_col not in df.columns or not len(df):
            return pd.DataFrame({"day": [], "tag": [],
                                 "n": pd.array([], dtype="int64"),
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna()
                     & df[type_col].isin([num_type, den_type]),
                     [ts_col, type_col]]
        g = pd.DataFrame({
            "day": np.datetime_as_string(
                sub[ts_col].to_numpy().astype("datetime64[D]")),
            "tag": (sub[type_col] == num_type).to_numpy()
            .astype(np.int64)}) \
            .groupby(["day", "tag"], sort=False) \
            .size().rename("n").reset_index()
        g["n"] = g["n"].astype(np.int64)
        g["part"] = (hash64(g["day"].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _ratio(df):
        if "day" not in df.columns or not len(df):
            return pd.DataFrame({"day": [],
                                 "n_num": pd.array([], dtype="int64"),
                                 "n_den": pd.array([], dtype="int64"),
                                 "ratio": []})
        cells = df.groupby(["day", "tag"], sort=False)["n"].sum() \
            .reset_index()
        piv = cells.pivot_table(index="day", columns="tag", values="n",
                                aggfunc="sum", fill_value=0)
        num = piv[1].to_numpy(np.float64) if 1 in piv.columns \
            else np.zeros(len(piv))
        den = piv[0].to_numpy(np.float64) if 0 in piv.columns \
            else np.zeros(len(piv))
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(den > 0, num / den, np.nan)
        return pd.DataFrame({"day": piv.index.to_numpy(),
                             "n_num": num.astype(np.int64),
                             "n_den": den.astype(np.int64),
                             "ratio": ratio})

    return ds.map_batches(_partial, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_ratio, batch_format="pandas")


def longest_daily_streak(ds, *, key_col: str = "user_id",
                         ts_col: str = "ts", batch_size: int = 65536):
    """Gaps-and-islands: each key's LONGEST run of consecutive active
    calendar days, plus the island count — SQL's classic
    ``day - row_number() * interval`` grouping trick. NULL keys / ts
    drop. Returns (key, longest_streak, n_streaks).

    Scale shape: per-batch DISTINCT (key, day) pairs shuffle once on
    key hash; inside each coarse partition one sort + two cumsum
    passes resolve the islands (break = new key OR day gap != 1), with
    no per-key loop — run lengths come from break-index differences.
    """
    import pandas as pd
    from engine.sketches import hash64
    from engine.shuffle import reduce_blocks
    P = reduce_blocks()

    def _days(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({key_col: [],
                                 "day": pd.array([], "datetime64[us]"),
                                 "part": pd.array([], dtype="int64")})
        sub = df.loc[df[ts_col].notna() & df[key_col].notna(),
                     [key_col, ts_col]]
        g = pd.DataFrame({key_col: sub[key_col],
                          "day": sub[ts_col].dt.floor("D")}) \
            .drop_duplicates()
        g["part"] = (hash64(g[key_col].to_numpy())
                     % np.uint64(P)).astype(np.int64)
        return g

    def _streaks(df):
        if key_col not in df.columns or not len(df):
            return pd.DataFrame({
                key_col: [],
                "longest_streak": pd.array([], dtype="int64"),
                "n_streaks": pd.array([], dtype="int64")})
        sub = df[[key_col, "day"]].drop_duplicates() \
            .sort_values([key_col, "day"],
                         kind="mergesort").reset_index(drop=True)
        n = len(sub)
        keys = sub[key_col].to_numpy()
        days = sub["day"].to_numpy().astype("datetime64[D]")
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        gap = np.r_[True, (days[1:] - days[:-1])
                    != np.timedelta64(1, "D")]
        brk = new_key | gap
        idx = np.arange(n, dtype=np.int64)
        starts = idx[brk]
        lens = np.diff(np.r_[starts, n])  # island lengths
        island_key = keys[starts]
        f = pd.DataFrame({key_col: island_key, "len": lens})
        g = f.groupby(key_col, sort=False)["len"]
        out = pd.DataFrame({
            "longest_streak": g.max().to_numpy(np.int64),
            "n_streaks": g.size().to_numpy(np.int64)})
        out.insert(0, key_col, g.max().index.to_numpy())
        return out

    return ds.map_batches(_days, batch_format="pandas",
                          batch_size=batch_size) \
        .groupby("part").map_groups(_streaks, batch_format="pandas")
