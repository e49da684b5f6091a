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

    def snapshot(self) -> dict[str, int]:
        return ray.get(self.actor.snapshot.remote())

    def shutdown(self) -> None:
        ray.kill(self.actor)
