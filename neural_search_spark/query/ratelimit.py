"""Sliding-window rate limiter for the serving loop (C3 in SURVEY.md §2).

The reference declares rate limiting but ships it as a no-op: config exposes
``rate_limit_requests: 100`` / ``rate_limit_window: 60`` (reference
``config.py:51-52``) and the middleware tracks the request without ever
rejecting (``main.py:69-77``, "In production, use Redis-based rate
limiting"). This is the working per-replica version of that declared
contract: an exact sliding window over request timestamps, O(1) amortized
per request, no external store — each stateless serving replica enforces
its own budget, which is how per-pod limits compose behind a round-robin
front end (global limits need the shared-store variant the reference's
comment defers to).

The clock is injectable so tests are deterministic — no sleeps.
"""

from __future__ import annotations

import time
from collections import deque


class SlidingWindowLimiter:
    """Allow at most ``max_requests`` in any trailing ``window_s`` seconds."""

    def __init__(self, max_requests: int, window_s: float, clock=time.monotonic):
        if max_requests <= 0:
            raise ValueError("max_requests must be positive")
        self.max_requests = max_requests
        self.window_s = float(window_s)
        self._clock = clock
        self._stamps: deque[float] = deque()
        self.n_allowed = 0
        self.n_rejected = 0

    def check(self) -> tuple[bool, float]:
        """(allowed, retry_after_s): admit the request or say when to retry.

        A rejected request is NOT recorded in the window (rejections are
        cheap; counting them would let a hot client lock itself out forever).
        """
        now = self._clock()
        cutoff = now - self.window_s
        stamps = self._stamps
        while stamps and stamps[0] <= cutoff:
            stamps.popleft()
        if len(stamps) < self.max_requests:
            stamps.append(now)
            self.n_allowed += 1
            return True, 0.0
        self.n_rejected += 1
        return False, max(0.0, stamps[0] + self.window_s - now)

    def stats(self) -> dict:
        return {
            "allowed": self.n_allowed,
            "rejected": self.n_rejected,
            "in_window": len(self._stamps),
            "max_requests": self.max_requests,
            "window_s": self.window_s,
        }
