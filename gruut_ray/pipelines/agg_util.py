"""Partial-aggregation helper.

For low-cardinality grouped aggregates (language counters, pricing summary,
window stats) the scale-correct plan is: combine inside every ``map_batches``
task (one row per key per batch), then merge the tiny partials table —
**no all-to-all shuffle of data rows**.  At 100 TB the partials are
(num_blocks × num_keys) rows — a few MB — so the final merge is a driver-side
pandas groupby; swap it for a one-block Ray aggregate if keys ever explode.
"""

from __future__ import annotations

import typing

import pandas as pd
import pyarrow as pa

if typing.TYPE_CHECKING:
    import ray.data


def partial_then_merge(
    ds: "ray.data.Dataset",
    partial_fn: typing.Callable[[pa.Table], pa.Table],
    group_keys: typing.Sequence[str],
    agg_spec: typing.Dict[str, str],
    sort: bool = True,
) -> pd.DataFrame:
    """map_batches(partial_fn) → collect partials → pandas merge.

    ``agg_spec`` maps column -> "sum"|"min"|"max" (how partials combine)."""
    partials = ds.map_batches(partial_fn, batch_format="pyarrow").to_pandas()
    if partials.empty:
        return partials
    out = partials.groupby(list(group_keys), as_index=False).agg(
        **{col: (col, how) for col, how in agg_spec.items()})
    if sort:
        out = out.sort_values(list(group_keys)).reset_index(drop=True)
    return out
