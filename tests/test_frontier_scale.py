"""Driver-state scale evidence (smoke tier of ``stress_frontier.py``).

The bucketed frontier's contract is that the DRIVER's footprint for a
wave is O(#hosts + #buckets x #parts) — sidecar aggregates — never
O(#rows). The full 10M-row measurement lives in ``stress_frontier.py``
(recorded in BASELINE.md); this smoke tier runs the same harness at
300k rows inside the shared Ray session and asserts the invariants that
make the big number meaningful:

  * rows are generated and spilled entirely inside Ray tasks,
  * the frontier loads from sidecars alone with row-independent state,
  * one full production wave (gate -> politeness -> deferral respill ->
    fetch join -> commit) completes with scheduled+deferred accounting
    exact, and
  * driver RSS growth across the whole run stays far below the row
    payload (the 300k frontier is ~45 MB of URL strings; the driver
    bound here is a fraction of it, and the bound is FLAT in rows —
    stress_frontier.py shows the same bound at 10M).
"""

import numpy as np

from stress_frontier import run


def test_frontier_wave_driver_state_bounded(ray_session, tmp_path):
    rows = 300_000
    res = run(rows=rows, n_hosts=5_000, hot_hosts=20, hot_share=0.2,
              tasks=8, budget=64, work_dir=str(tmp_path / "stress"),
              num_buckets=16, seen_shards=2)

    # full accounting: every frontier row is either scheduled now or
    # politeness-deferred to a later rank (unique synthetic URLs, empty
    # seen ledger, no robots rules for the stress hosts)
    assert res["scheduled"] + res["deferred"] == rows
    # the budget must actually bind (hot hosts over budget) so the
    # politeness pre-pass + rank respill paths are exercised
    assert res["hosts_over_budget"] >= 20
    assert res["deferred"] > 0

    # driver growth across generate+load+wave must be far below the row
    # payload: 300k rows is ~45 MB of URL strings before parquet/Arrow
    # overheads; the driver holds counts, not rows. The bound is loose
    # for CI stability (Ray's own driver-side buffers fluctuate) but a
    # driver that materialized rows would blow through it several-fold.
    assert res["driver_rss_delta_mb"] < 120, res

    # the wave must do its work distributed, not serially on the driver:
    # throughput floor is intentionally weak (4-CPU test session)
    assert res["wave_urls_per_sec"] > 10_000, res
