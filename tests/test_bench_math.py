"""Pure-Python checks of bench.py's scaling-bracket arithmetic.

The A-B-A bracket math decides the round's scaling gate
(BENCH/BASELINE.md); these tests pin it without running Spark:
each N leg is rated against the MEAN of its two bracketing 4N legs,
efficiency = (rate_4N / rate_N) / 4, and a retry bracket appended to
the chain reuses the previous tail 4N leg as its "before" leg.
"""

from bench import (  # repo root on sys.path via conftest
    _bracket_draw,
    _fence_orphan,
    _median,
)


def _leg(rate, events=100, secs=None):
    return {
        "events_per_sec": float(rate),
        "events": events,
        "secs": events / rate if secs is None else secs,
    }


def test_bracket_uses_mean_of_bracketing_4n_legs():
    legs_4n = [_leg(400.0), _leg(480.0)]
    legs_n = [_leg(110.0)]
    d = _bracket_draw(legs_4n, legs_n, 0)
    assert d["bracket"] == 0
    assert d["events_per_sec_4n"] == 440.0  # mean(400, 480)
    assert d["events_per_sec_4n_before"] == 400.0
    assert d["events_per_sec_4n_after"] == 480.0
    assert d["efficiency"] == 1.0  # 440 / 110 / 4


def test_perfect_linear_scaling_is_efficiency_one():
    legs_4n = [_leg(4000.0), _leg(4000.0)]
    legs_n = [_leg(1000.0)]
    assert _bracket_draw(legs_4n, legs_n, 0)["efficiency"] == 1.0


def test_retry_bracket_extends_the_same_chain():
    # Planned chain: 4N, N, 4N (one bracket, bad window -> eff < 0.8).
    legs_4n = [_leg(280.0), _leg(300.0)]
    legs_n = [_leg(120.0)]
    draws = [_bracket_draw(legs_4n, legs_n, 0)]
    assert draws[0]["efficiency"] < 0.8

    # Retry appends N then 4N: the prior tail 4N (300.0) becomes the new
    # bracket's "before" leg — same A-B-A shape, no discarded legs.
    legs_n.append(_leg(100.0))
    legs_4n.append(_leg(380.0))
    draws.append(_bracket_draw(legs_4n, legs_n, 1))

    d = draws[1]
    assert d["bracket"] == 1
    assert d["events_per_sec_4n_before"] == 300.0
    assert d["events_per_sec_4n_after"] == 380.0
    assert d["efficiency"] == 0.85  # mean(300, 380)=340; 340/100/4
    # gate logic: best-of across ALL draws, planned and retried
    assert max(x["efficiency"] for x in draws) >= 0.8


def test_median_over_all_draws():
    # odd count: middle value; even count: mean of the two middles.
    # The artifact ships this next to best-of because conditional retry
    # draws bias a max statistic upward; the median does not reward them.
    assert _median([0.353, 0.535, 0.631]) == 0.535
    assert _median([0.788, 1.004]) == 0.896
    assert _median([1.004]) == 1.004
    assert _median([0.7, 0.9, 0.8, 1.0]) == 0.85


def test_fence_orphan_pops_only_an_unbracketed_n_leg():
    # retry N leg completed, trailing 4N failed: invariant broken
    # (len(legs_4n) == len(legs_n)), so the N leg is popped and
    # RETURNED — it must ship as retry_orphan_n_leg, not vanish.
    legs_4n = [_leg(400), _leg(400), _leg(400)]  # 2 brackets' worth
    legs_n = [_leg(100), _leg(100), _leg(105)]   # + one unbracketed
    orphan = _fence_orphan(legs_n, legs_4n)
    assert orphan == _leg(105)
    assert len(legs_4n) == len(legs_n) + 1  # invariant restored


def test_fence_orphan_never_pops_a_bracketed_leg():
    # retry N leg itself failed: lists are already consistent — a pop
    # here would silently drop a PLANNED, fully-bracketed leg.
    legs_4n = [_leg(400), _leg(400), _leg(400)]
    legs_n = [_leg(100), _leg(100)]
    assert _fence_orphan(legs_n, legs_4n) is None
    assert len(legs_n) == 2


def test_secs_come_from_the_matching_legs():
    legs_4n = [_leg(400.0, secs=402.18), _leg(480.0, secs=333.42)]
    legs_n = [_leg(110.0, secs=363.64)]
    d = _bracket_draw(legs_4n, legs_n, 0)
    assert d["secs_4n_before"] == 402.2
    assert d["secs_4n_after"] == 333.4
    assert d["secs_n"] == 363.6
