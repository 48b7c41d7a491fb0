"""Shuffle tuning helpers.

Ray Data's sort-based groupby derives its reduce parallelism from the
upstream block count; a partial-aggregate stage that collapses a corpus into
a few small blocks therefore serializes the per-group reduce (measured 10x:
95k-group aggregate 9-14s at 2 blocks vs 1.4s at 64). ``balance`` inserts an
explicit repartition so reduce parallelism tracks the cluster size instead of
the accident of upstream blocking.

Partial datasets are combiner outputs — orders of magnitude smaller than the
corpus — so the extra balancing pass is cheap relative to the corpus scan at
any scale, and it is what sets the reduce width explicitly (the knob a
multi-node deployment would tune to nodes x cores).
"""

from __future__ import annotations


def reduce_blocks(multiplier: int = 2, default_cpus: int = 8) -> int:
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", default_cpus)) \
            if ray.is_initialized() else default_cpus
    except Exception:  # pragma: no cover
        cpus = default_cpus
    return max(8, multiplier * cpus)


def balance(ds, blocks: int | None = None):
    """Repartition a (small, pre-aggregated) dataset for the following
    groupby's reduce parallelism."""
    return ds.repartition(blocks if blocks is not None else reduce_blocks())


def tree_reduce(parts, merge_block, *, fanout: int = 32,
                driver_limit: int = 64):
    """Distributed tree reduction of a dataset of mergeable partial rows.

    Each round coalesces ~``fanout`` rows per block and applies
    ``merge_block`` (pa.Table -> pa.Table, >=1 merged row per block), so
    the partial count shrinks geometrically and the driver only ever
    iterates the final <= ``driver_limit`` rows — never one row per input
    batch. That is the difference between O(actors) and O(batches) driver
    traffic: at a 10^9-key catalog a partial Bloom is ~1 GB, and batches x
    1 GB OR-merged through one process is a scale-killer (the repartition
    here is coalesce-only — no all-to-all shuffle).

    Returns the final small MATERIALIZED dataset for a driver-side merge.
    """
    cur = parts.materialize()
    n = cur.count()
    while n > driver_limit:
        blocks = max(1, (n + fanout - 1) // fanout)
        cur = cur.repartition(blocks).map_batches(
            merge_block, batch_format="pyarrow",
            batch_size=None).materialize()
        prev, n = n, cur.count()
        if n >= prev:  # merge fn did not shrink: avoid an infinite loop
            break
    return cur


def column_dtype(ds, col: str, default=None):
    """Arrow dtype of ``ds``'s column ``col``, for typed-empty substitution
    on the all-filtered-corpus corner (Ray never calls UDFs on empty
    blocks, so a fully-filtered pipeline yields a SCHEMALESS empty).

    Metadata-only first (never executes the plan); falls back to
    ``fetch_if_missing=True`` — which may execute enough of the plan to
    read one block — only when metadata is absent. Callers invoke this
    lazily, inside the empty-result branch, so the fetch is a corner-case
    cost; the alternative was guessing ``pa.string()`` for an int key and
    returning a WRONG-TYPED empty.
    """
    import pyarrow as pa
    for fetch in (False, True):
        try:
            sch = ds.schema(fetch_if_missing=fetch)
            if sch is None:
                continue
            base = sch.base_schema
            try:
                return base.field(col).type
            except Exception:
                # pandas-block datasets report a PandasBlockSchema
                # (names + numpy dtypes), not an Arrow schema
                i = list(base.names).index(col)
                return pa.from_numpy_dtype(base.types[i])
        except Exception:
            pass
    return default if default is not None else pa.string()


def join_partitions(divisor: int = 2, default_cpus: int = 8) -> int:
    """Partition count for hash joins (``Dataset.join``).

    Each join partition is backed by a HashShuffleAggregator actor that
    holds its partition in memory — so the count must track cluster CPUs,
    NOT the upstream block count. Over-provisioning aggregators on one node
    over-reserves object-store memory and can deadlock the pipeline
    (observed: two chained 64-partition joins hang on a 32-CPU box, the
    same joins at 8-16 partitions finish in seconds).
    """
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", default_cpus)) \
            if ray.is_initialized() else default_cpus
    except Exception:  # pragma: no cover
        cpus = default_cpus
    return max(4, cpus // divisor)
