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


def revenue_by_segment(orders_ds, customer_ds, *, batch_size: int = 65536,
                       concurrency=None):
    """orders x customer broadcast hash join -> revenue per market segment."""
    import ray

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

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd
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
        return pa.Table.from_pandas(g, preserve_index=False)

    from engine.shuffle import balance
    partials = balance(events_ds.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency))
    from ray.data.aggregate import Sum
    agg = partials.groupby(["user_id", "hour"]).aggregate(
        Sum("n_events"), Sum("value_sum"))

    def _final(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            # pandas produced ns; emit us to match SQL date_trunc exactly
            "hour": pc.cast(b.column("hour"), pa.timestamp("us")),
            "n_events": b.column("sum(n_events)"),
            "value_sum": b.column("sum(value_sum)"),
        })

    return agg.map_batches(_final, batch_format="pyarrow")


def sessionize(events_ds, *, gap_minutes: int = 30, batch_size: int = 65536):
    """Gap-based sessionization: events of one user sorted by time; a gap
    > ``gap_minutes`` starts a new session. Shuffle key = user_id (each
    user's events must be co-located and ordered — the documented
    partitioning assumption); per-group work is vectorized numpy.

    Output: (user_id, session_id, n_events, session_start, session_end).
    """
    import pandas as pd

    gap = np.timedelta64(gap_minutes * 60, "s")

    def _sessions(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values("ts")
        ts = df["ts"].to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_session)
        g = pd.DataFrame({"user_id": df["user_id"].to_numpy(), "sid": sid,
                          "ts": ts}).groupby("sid")
        out = g.agg(user_id=("user_id", "first"), n_events=("ts", "size"),
                    session_start=("ts", "min"),
                    session_end=("ts", "max")).reset_index()
        out = out.rename(columns={"sid": "session_id"})
        out["session_id"] = out["session_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        # us precision to match SQL timestamps exactly
        out["session_start"] = out["session_start"].astype("datetime64[us]")
        out["session_end"] = out["session_end"].astype("datetime64[us]")
        return out[["user_id", "session_id", "n_events", "session_start",
                    "session_end"]]

    return events_ds.select_columns(["user_id", "ts"]).groupby(
        "user_id").map_groups(_sessions, batch_format="pandas")


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


def q3_shipping_priority(lineitem_ds, orders_ds, customer_ds, *,
                         segment: str = "BUILDING",
                         cutoff: str = "1998-06-01", k: int = 10,
                         batch_size: int = 65536, concurrency=None):
    """TPC-H Q3 shape: top-k orders by revenue for one market segment.

    Scale shape — one broadcast semi-join + ONE data-data hash join:

    1. segment customers -> broadcast key array (the dimension is small;
       ``np.isin`` per batch) filters orders map-only, with the date filter
       fused into the same pass; only (o_orderkey, o_orderdate) survive;
    2. lineitem is filtered + pre-aggregated per l_orderkey INSIDE
       ``map_batches`` (combiner), so the hash join moves one partial
       revenue row per (orderkey x batch), never raw lineitem rows;
    3. ``Dataset.join`` on orderkey (partitions track cluster CPUs);
    4. final (orderkey, orderdate) groupby-sum is over joined partials;
       top-k via sort + limit on the aggregated (bounded) rows.
    """
    import ray

    cutoff64 = np.datetime64(cutoff, "us")

    cust = customer_ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), segment))
        .select(["c_custkey"]), batch_format="pyarrow")
    keys = np.unique(cust.to_pandas()["c_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    def _orders(b: pa.Table) -> pa.Table:
        side = ray.get(keys_ref)
        od = pc.cast(b.column("o_orderdate"), pa.timestamp("us")) \
            .to_numpy(zero_copy_only=False)
        ck = b.column("o_custkey").to_numpy(zero_copy_only=False)
        mask = (od < cutoff64) & np.isin(ck, side)
        sub = b.filter(pa.array(mask))
        return pa.table({"o_orderkey": sub.column("o_orderkey"),
                         "o_orderdate": pc.cast(sub.column("o_orderdate"),
                                                pa.timestamp("us"))})

    orders = orders_ds.map_batches(_orders, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=batch_size,
                                   concurrency=concurrency)

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

    out = agg.map_batches(_final, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["revenue", "o_orderdate", "l_orderkey"],
                          ascending=[False, True, True]).head(k)
    return out.reset_index(drop=True)
