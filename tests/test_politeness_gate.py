"""Property tests for the ms-exact politeness gate discretization
(kernels/politeness.py ≙ HostQueue.scala:128-141's continuous-time rule:
dequeue only if now > crawlDelayEnd, then crawlDelayEnd = now + crawlDelay).

The round protocol schedules as-early-as-possible fetch times; these tests
check it against a direct simulation of the reference's gate."""

from hypothesis import given, settings
from hypothesis import strategies as st

from abwcf_spark.kernels.politeness import advance_gate, budget_for_round


def simulate_reference_gate(next_free_ms, round_idx, delay_ms, round_ms, cap):
    """Naive simulation: fetch at the earliest legal instant, repeatedly,
    while still inside the round window."""
    t = max(next_free_ms, round_idx * round_ms)
    end = (round_idx + 1) * round_ms
    times = []
    while t < end and len(times) < cap:
        times.append(t)
        t += delay_ms
        if delay_ms <= 0:
            break  # degenerate: unbounded rate, budget == cap
    if delay_ms <= 0:
        return cap if max(next_free_ms, round_idx * round_ms) < end else 0
    return len(times)


@given(
    next_free=st.integers(0, 10**7),
    rnd=st.integers(0, 5000),
    delay=st.integers(0, 25_000),
    round_ms=st.sampled_from([250, 1000, 4000]),
    cap=st.integers(1, 64),
)
@settings(max_examples=500, deadline=None)
def test_budget_matches_reference_simulation(next_free, rnd, delay, round_ms, cap):
    budget, first = budget_for_round(next_free, rnd, delay, round_ms, cap)
    want = simulate_reference_gate(next_free, rnd, delay, round_ms, cap)
    assert budget == want
    assert budget >= 0
    if budget > 0:
        start = max(next_free, rnd * round_ms)
        assert first == start
        assert start <= first < (rnd + 1) * round_ms


@given(
    next_free=st.integers(0, 10**7),
    rnd=st.integers(0, 5000),
    delay=st.integers(0, 25_000),
    fetched=st.integers(0, 64),
    round_ms=st.sampled_from([250, 1000, 4000]),
)
@settings(max_examples=500, deadline=None)
def test_gate_advance_monotone_and_spaced(next_free, rnd, delay, fetched, round_ms):
    g = advance_gate(next_free, rnd, delay, fetched, round_ms)
    if fetched == 0:
        assert g == next_free  # gate only advances on dequeue (HostQueue:131)
    else:
        start = max(next_free, rnd * round_ms)
        assert g == start + fetched * max(delay, 0)
        assert g >= next_free


def test_reference_defaults_budget_one():
    """delay 1 s, round 1 s → exactly 1 fetch/round: the reference gate
    verbatim (fixtures' determinism pin)."""
    gate = 0
    for rnd in range(5):
        budget, _ = budget_for_round(gate, rnd, 1000, 1000, 1000)
        assert budget == 1
        gate = advance_gate(gate, rnd, 1000, 1, 1000)


def test_delay_two_rounds_alternates():
    """delay 2 s, round 1 s → a fetch every other round."""
    gate, got = 0, []
    for rnd in range(6):
        budget, _ = budget_for_round(gate, rnd, 2000, 1000, 1000)
        got.append(budget)
        gate = advance_gate(gate, rnd, 2000, min(budget, 1), 1000)
    assert got == [1, 0, 1, 0, 1, 0]
