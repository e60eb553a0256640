"""Cross-run incremental dedup: Bloom history persisted between runs
(gruut_ray/state/incremental.py).  Three-day lifecycle: day 1 keeps all,
day 2 drops day-1 repeats and its own internal dups, day 3 re-submitting
day 2 keeps (almost) nothing."""

import pandas as pd
import pytest

from gruut_ray.state.incremental import (
    incremental_dedup_run,
    load_state,
)


def _docs(ids):
    return pd.DataFrame({
        "doc_id": list(ids),
        "text": [f"document body number {i}" for i in ids],
    })


def test_incremental_three_day_lifecycle(ray_session, tmp_path):
    import ray

    state = str(tmp_path / "state")

    # day 1: fresh corpus, includes an internal duplicate pair
    d1 = _docs(range(0, 1000))
    d1.loc[999, "text"] = d1.loc[0, "text"]  # within-run dup
    r1 = incremental_dedup_run(
        ray.data.from_pandas(d1), state, str(tmp_path / "day1"),
        n_items_hint=10_000)
    assert r1["rows_in"] == 1000
    assert r1["rows_kept"] == 999  # only the internal dup dropped
    assert r1["run"] == 1

    bloom, meta = load_state(state)
    assert bloom is not None and meta["items"] == 999

    # day 2: half repeats of day 1, half new
    d2 = _docs(range(500, 1500))
    r2 = incremental_dedup_run(
        ray.data.from_pandas(d2), state, str(tmp_path / "day2"))
    assert r2["run"] == 2
    # every repeat is dropped (no false negatives), new docs survive
    # modulo the fp rate.  Texts in history are 0..998 (999's body was
    # overwritten on day 1), so day 2's new texts are 999..1499 → 501.
    assert r2["rows_kept"] <= 501
    assert r2["rows_kept"] >= 491  # ≥98% of the 501 new kept
    assert r2["fp_estimate"] < 0.05

    # day 3: resubmit day 2 verbatim — everything is history now
    r3 = incremental_dedup_run(
        ray.data.from_pandas(d2), state, str(tmp_path / "day3"))
    assert r3["rows_kept"] == 0

    _, meta = load_state(state)
    assert meta["runs"] == 3
    assert meta["items"] == r1["rows_kept"] + r2["rows_kept"]


def test_incremental_first_run_requires_hint(ray_session, tmp_path):
    import ray

    with pytest.raises(ValueError):
        incremental_dedup_run(
            ray.data.from_pandas(_docs(range(10))),
            str(tmp_path / "s"), str(tmp_path / "o"))


def test_incremental_crash_before_save_is_rerunnable(ray_session, tmp_path):
    """State saves atomically AFTER the parquet write: simulate the crash
    by running day 2 without letting it save (kill via exception is hard
    to inject; instead verify determinism — running the same increment
    against the same state twice drops the same rows)."""
    import ray

    state = str(tmp_path / "state")
    incremental_dedup_run(
        ray.data.from_pandas(_docs(range(100))), state,
        str(tmp_path / "day1"), n_items_hint=10_000)
    bloom_before, _ = load_state(state)

    d2 = _docs(range(50, 150))
    from gruut_ray.state.incremental import filter_new
    kept_a = sorted(filter_new(
        ray.data.from_pandas(d2), bloom_before,
        "text").to_pandas()["doc_id"])
    kept_b = sorted(filter_new(
        ray.data.from_pandas(d2), bloom_before,
        "text").to_pandas()["doc_id"])
    assert kept_a == kept_b
    assert all(i >= 100 for i in kept_a)
