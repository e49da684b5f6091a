"""Global metrics actor: the reference's ``crawler.stats`` add-only
counter dict (SURVEY.md 2.6 A1) as a Ray actor.

Batch UDFs accumulate counters locally per batch and flush ONE increment
RPC per batch (fire-and-forget), so the hot path never blocks on the
actor; the driver folds totals into the per-wave checkpoint manifest.
"""

from __future__ import annotations

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self) -> None:
        self._counters: dict[str, int] = {}

    def incr(self, deltas: dict[str, int]) -> None:
        for k, v in deltas.items():
            if v:
                self._counters[k] = self._counters.get(k, 0) + int(v)

    def snapshot(self) -> dict[str, int]:
        return dict(self._counters)

    def reset(self) -> None:
        self._counters.clear()


class Metrics:
    """Driver-side handle; safe to pickle into tasks (holds the actor
    handle only)."""

    def __init__(self, name: str | None = None):
        import uuid
        self.actor = MetricsActor.options(
            name=f"metrics-{name or uuid.uuid4().hex[:8]}",
            get_if_exists=True).remote()

    def incr(self, deltas: dict[str, int]) -> None:
        # fire-and-forget: never blocks the data plane
        self.actor.incr.remote(deltas)

    def incr_sync(self, deltas: dict[str, int]) -> None:
        """Blocking increment for LOAD-BEARING counters read back by
        the driver right after a job completes (e.g. the bucketed
        wave's scheduled/deferred counts, which feed the outputs
        marker and resume manifests): the task returns only after the
        actor has processed the delta, so job-done => counts visible.
        Fire-and-forget deltas may still be in flight at that point —
        use one sync flush per task, not per batch."""
        ray.get(self.actor.incr.remote(deltas))

    def snapshot(self) -> dict[str, int]:
        return ray.get(self.actor.snapshot.remote())

    def shutdown(self) -> None:
        ray.kill(self.actor)
