"""Adaptive per-host politeness delays (AutoThrottle, T7 dynamics).

The reference configures Scrapy's AutoThrottle extension
(``RISJbot/settings.py:236-247``: ``AUTOTHROTTLE_START_DELAY=5``,
``AUTOTHROTTLE_MAX_DELAY=60``, ``AUTOTHROTTLE_TARGET_CONCURRENCY=1.0``,
disabled by default — exactly as here). The publicly documented
algorithm (Scrapy docs, topics/autothrottle):

- each host ("slot") starts at ``start_delay``;
- every response updates the host's delay to the AVERAGE of the current
  delay and ``latency / target_concurrency``;
- responses that failed can never DECREASE the delay;
- the result is clamped to ``[download_delay, max_delay]``
  (``DOWNLOAD_DELAY`` is the floor, ``settings.py:88-94``).

Batch adaptation: this engine fetches in waves, not single requests, so
the unit of observation is the host's MEAN page-fetch latency over one
wave, applied through the same update rule once per wave. The resulting
delay maps to the next wave's per-host budget as
``floor(wave_seconds / delay)`` (how many polite fetches fit in one wave
period), hard-capped by the static ``per_host_budget``
(``CONCURRENT_REQUESTS_PER_DOMAIN``-style cap) — AutoThrottle only ever
tightens the static politeness budget, never loosens it.

State is O(#hosts) on the driver; observations arrive as two counters
per host through the metrics actor, so the data plane never blocks.
"""

from __future__ import annotations


class AutoThrottle:
    """Per-host adaptive download-delay controller."""

    def __init__(self, start_delay: float = 5.0, max_delay: float = 60.0,
                 target_concurrency: float = 1.0,
                 download_delay: float = 0.0):
        if target_concurrency <= 0:
            raise ValueError("target_concurrency must be > 0")
        self.start_delay = float(start_delay)
        self.max_delay = float(max_delay)
        self.target_concurrency = float(target_concurrency)
        self.download_delay = float(download_delay)
        self.delays: dict[str, float] = {}

    def delay_of(self, host: str) -> float:
        return self.delays.get(host, self.start_delay)

    def observe(self, host: str, latency: float, ok: bool = True) -> float:
        """Fold one latency observation (seconds) into the host's delay
        per the documented update rule; returns the new delay."""
        cur = self.delay_of(host)
        target = latency / self.target_concurrency
        new = (cur + target) / 2.0
        if not ok:
            # failed responses never speed a host up
            new = max(new, cur)
        new = min(max(new, self.download_delay), self.max_delay)
        self.delays[host] = new
        return new

    def budget_of(self, host: str, wave_seconds: float,
                  hard_cap: int) -> int:
        """Per-wave fetch budget implied by the host's current delay:
        the number of delay-spaced fetches that fit in one wave period,
        at least 1 (a throttled host still makes progress), at most the
        static per-host cap."""
        d = self.delay_of(host)
        if d <= 0:
            return hard_cap
        return max(1, min(hard_cap, int(wave_seconds / d)))

    def budgets(self, hosts, wave_seconds: float,
                hard_cap: int) -> dict[str, int]:
        """Budgets for the hosts whose budget the throttle TIGHTENS
        (hosts at the hard cap are omitted — absent means 'use the
        static budget', keeping the dict O(#throttled-hosts))."""
        out = {}
        for h in hosts:
            b = self.budget_of(h, wave_seconds, hard_cap)
            if b < hard_cap:
                out[h] = b
        return out
