"""Distributed top-k reduce (agg_util.topk_reduce, VERDICT r03 #2)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from gruut_ray.pipelines.agg_util import topk_reduce


def _parts_ds(n_rows, n_blocks, k):
    """Per-block bottom-k partials over a deterministic value column."""
    import ray.data

    rng = np.random.RandomState(7)
    ids = np.arange(n_rows, dtype=np.int64)
    vals = rng.permutation(n_rows).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "val": vals})) \
        .repartition(n_blocks)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["val", "id"]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    truth = (pd.DataFrame({"id": ids, "val": vals})
             .sort_values(["val", "id"]).head(k).reset_index(drop=True))
    return parts, truth


def test_topk_reduce_matches_brute_force_many_blocks(ray_session):
    parts, truth = _parts_ds(n_rows=5000, n_blocks=40, k=25)
    out = topk_reduce(parts, 25, by=["val", "id"],
                      ascending=[True, True])
    assert len(out) == 25
    pd.testing.assert_frame_equal(out[["id", "val"]], truth)


def test_topk_reduce_driver_rows_bounded_by_k(ray_session):
    # more blocks than k: the naive collect would hand the driver
    # blocks x k rows; the reduce must hand back exactly k
    parts, truth = _parts_ds(n_rows=3000, n_blocks=60, k=10)
    out = topk_reduce(parts, 10, by=["val", "id"],
                      ascending=[True, True], width=8)
    assert len(out) == 10
    pd.testing.assert_frame_equal(out[["id", "val"]], truth)


def test_topk_reduce_partition_invariant(ray_session):
    a, _ = _parts_ds(n_rows=2000, n_blocks=3, k=15)
    b, _ = _parts_ds(n_rows=2000, n_blocks=37, k=15)
    out_a = topk_reduce(a, 15, by=["val", "id"], ascending=[True, True])
    out_b = topk_reduce(b, 15, by=["val", "id"], ascending=[True, True])
    pd.testing.assert_frame_equal(out_a, out_b)


def test_topk_reduce_descending_and_short_input(ray_session):
    parts, _ = _parts_ds(n_rows=8, n_blocks=4, k=50)
    out = topk_reduce(parts, 50, by=["val", "id"],
                      ascending=[False, True])
    assert len(out) == 8  # fewer rows than k: all survive
    assert list(out["val"]) == sorted(out["val"], reverse=True)


def test_topk_reduce_empty_input_keeps_schema(ray_session):
    """Zero surviving rows (fully-filtered corpus): the reduce must
    return a TYPED empty frame, not a column-less one, so callers
    indexing columns don't crash (ADVICE r04)."""
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "id": pa.array([], type=pa.int64()),
        "val": pa.array([], type=pa.int64())}))
    # derived from parts.schema()
    out = topk_reduce(ds, 5, by=["val", "id"], ascending=[True, True])
    assert list(out.columns) == ["id", "val"] and out.empty
    # explicit schema wins even when parts can't report one
    out2 = topk_reduce(ds, 5, by=["val", "id"], ascending=[True, True],
                       schema=pa.schema([("id", pa.int64()),
                                         ("val", pa.int64())]))
    assert list(out2.columns) == ["id", "val"] and out2.empty
    assert out2["val"].dtype == np.int64
