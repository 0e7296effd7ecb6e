"""Round-8 ADVICE nit regression tests.

1. staging.code_token's no-source fallback must distinguish exec'd
   functions that differ only in a constant / name / closure cell (the
   bytecode-only hash collided on those).
2. The sharded debounce must tolerate NULL event_type (it became a
   lexsort key in round 7; None-vs-str comparison raised TypeError).
3. The sharded debounce state must not grow append-only under NoTimeout:
   entries older than GAP + LATE_ALLOWANCE behind the shard's max event
   time are evicted at write-back (decision-equivalent, see docstring).
"""

from __future__ import annotations

import pandas as pd


class FakeState:
    exists = False

    def update(self, v):
        self.exists = True
        self._v = v

    @property
    def get(self):
        return self._v


def _exec_fn(src: str):
    ns: dict = {}
    exec(compile(src, "<round8-gen>", "exec"), ns)  # no retrievable source
    return ns["f"]


def test_code_token_fallback_distinguishes_constants_and_names():
    from nextgenetl_spark.staging import code_token

    f_plus1 = _exec_fn("def f(x):\n    return x + 1\n")
    f_plus2 = _exec_fn("def f(x):\n    return x + 2\n")
    # same bytecode, different co_consts — must produce different tokens
    assert f_plus1.__code__.co_code == f_plus2.__code__.co_code
    assert code_token(f_plus1) != code_token(f_plus2)

    f_len = _exec_fn("def f(x):\n    return len(x)\n")
    f_abs = _exec_fn("def f(x):\n    return abs(x)\n")
    assert f_len.__code__.co_code == f_abs.__code__.co_code
    assert code_token(f_len) != code_token(f_abs)

    # stable across re-exec of identical source (cache hits across runs)
    assert code_token(f_plus1) == code_token(_exec_fn("def f(x):\n    return x + 1\n"))


def test_code_token_fallback_folds_closure_cells():
    from nextgenetl_spark.staging import code_token

    src = "def mk(th):\n    def f(x):\n        return x > th\n    return f\ndef f():\n    pass\n"
    ns: dict = {}
    exec(compile(src, "<round8-gen>", "exec"), ns)
    g1, g2 = ns["mk"](0.5), ns["mk"](0.7)  # identical code, threshold in a cell
    assert code_token(g1) != code_token(g2)
    assert code_token(g1) == code_token(ns["mk"](0.5))


def test_shard_debounce_tolerates_null_event_type():
    from nextgenetl_spark.streaming.stateful import _debounce_shard_group

    t0 = 1_700_000_000_000_000
    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 7, 8],
            "event_type": [None, "click", None, "view"],
            "ts_us": [t0, t0 + 1_000_000, t0 + 2_000_000, t0],
        }
    )
    out = pd.concat(list(_debounce_shard_group((0,), iter([rows]), FakeState())))
    # null-typed events debounce as their own (user, None) series: the
    # second None event at +2s is within the 5-min gap of the first → drop
    assert sorted(out["event_id"]) == [1, 2, 4]


def test_shard_debounce_evicts_stale_state_entries():
    from nextgenetl_spark.streaming.stateful import (
        DEBOUNCE_GAP_US,
        DEBOUNCE_LATE_ALLOWANCE_US,
        _debounce_shard_group,
    )

    t0 = 1_700_000_000_000_000
    horizon = DEBOUNCE_GAP_US + DEBOUNCE_LATE_ALLOWANCE_US
    state = FakeState()
    # batch 1: user 1 at t0, user 2 at t0 + horizon + 60s — user 1's entry
    # is already unreachable by any in-allowance future event
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 2],
            "event_type": ["click", "click"],
            "ts_us": [t0, t0 + horizon + 60_000_000],
        }
    )
    list(_debounce_shard_group((0,), iter([b1]), state))
    users, types, last = state.get
    assert list(users) == [2]  # user 1 evicted, user 2 retained

    # the evicted entry is decision-equivalent: user 1's next in-allowance
    # event (> last + GAP by construction) is kept, exactly as if the
    # entry had been retained
    b2 = pd.DataFrame(
        {
            "event_id": [3],
            "user_id": [1],
            "event_type": ["click"],
            "ts_us": [t0 + horizon + 61_000_000],
        }
    )
    out = pd.concat(list(_debounce_shard_group((0,), iter([b2]), state)))
    assert list(out["event_id"]) == [3]
