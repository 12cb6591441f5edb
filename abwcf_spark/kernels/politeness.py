"""Per-host politeness gate, discretized to micro-batch rounds.

The reference enforces a continuous-time gap between fetches to the same
host (``HostQueue.scala:128-141``: dequeue max-priority page only if
``now > crawlDelayEnd``, then ``crawlDelayEnd = now + crawlDelay``).  The
round protocol discretizes this with as-early-as-possible fetch times in
integer virtual MILLISECONDS (exact arithmetic — no float drift between the
Spark engine and the pure-Python oracle):

Round ``r`` spans ``[r*round_ms, (r+1)*round_ms)``.  A host entering round
``r`` with gate ``next_free_ms`` may fetch at times
``t_k = max(next_free_ms, r*round_ms) + k*delay_ms`` for ``k = 0.. `` while
``t_k < (r+1)*round_ms``.  After ``m`` actual fetches the gate advances to
``t_0 + m*delay_ms``; if nothing is fetched the gate is unchanged (the
reference's gate also only advances on dequeue).

When ``delay_ms == 0`` the budget is capped (the reference would allow an
unbounded rate; ``cap`` bounds round size for determinism).
"""

from __future__ import annotations


def budget_for_round(
    next_free_ms: int,
    round_idx: int,
    delay_ms: int,
    round_ms: int = 1000,
    cap: int = 1000,
) -> tuple[int, int]:
    """→ (budget, first_fetch_time_ms). budget may be 0."""
    start = max(next_free_ms, round_idx * round_ms)
    end = (round_idx + 1) * round_ms
    if start >= end:
        return 0, start
    if delay_ms <= 0:
        return cap, start
    budget = (end - start + delay_ms - 1) // delay_ms  # ceil
    return min(budget, cap), start


def advance_gate(
    next_free_ms: int,
    round_idx: int,
    delay_ms: int,
    fetched: int,
    round_ms: int = 1000,
) -> int:
    """Gate after ``fetched`` actual fetches in round ``round_idx``."""
    if fetched <= 0:
        return next_free_ms
    start = max(next_free_ms, round_idx * round_ms)
    return start + fetched * max(delay_ms, 0)
