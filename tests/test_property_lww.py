"""Property-based LWW semantics: for arbitrary op interleavings with
duplicate deliveries, out-of-order timestamps, and ts ties, every LWW
variant must equal an independent pure-Python oracle fold.

(Complements the seeded randomized end-to-end tests in test_engine.py:
hypothesis explores adversarial small cases — ties, all-deletes,
single-key storms — that random sampling at scale rarely hits.)"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tap_github_search_spark.operators.dedup import (
    final_state,
    lww_winners,
    lww_winners_ord,
    lww_winners_salted,
    lww_winners_window,
)
from tap_github_search_spark.schema import CHANGE_EVENT_SCHEMA

# a tiny key/time space forces collisions, ties, and delete-vs-update races
events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),           # op
        st.integers(0, 2),                          # conv (3 keys)
        st.integers(0, 1),                          # turn (2 idx)
        st.integers(0, 5),                          # ts second (ties likely)
    ),
    min_size=1,
    max_size=30,
)


def _python_oracle(rows):
    """Pure-Python fold: winner per key = max (ts, seq); drop 'D'."""
    best = {}
    for seq, (op, conv, turn, ts) in enumerate(rows):
        k = (conv, turn)
        if k not in best or (ts, seq) > (best[k][0], best[k][1]):
            best[k] = (ts, seq, op)
    return {k: (v[0], v[1]) for k, v in best.items() if v[2] != "D"}


@pytest.fixture(scope="module")
def _spark():
    from tap_github_search_spark.session import get_spark

    s = get_spark(cores=2, shuffle_partitions=2, app_name="hypothesis")
    s.sparkContext.setLogLevel("ERROR")
    return s


@given(rows=events_strategy)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_all_lww_variants_match_python_oracle(_spark, rows):
    base = datetime(2025, 1, 1, tzinfo=timezone.utc)
    data = [
        (seq, op, f"c{conv}", turn, "user", f"t{seq}", None,
         datetime.fromtimestamp(base.timestamp() + ts, tz=timezone.utc))
        for seq, (op, conv, turn, ts) in enumerate(rows)
    ]
    # duplicate delivery of every 3rd event (at-least-once)
    data += [r for i, r in enumerate(data) if i % 3 == 0]
    df = _spark.createDataFrame(data, CHANGE_EVENT_SCHEMA)

    expect = _python_oracle(rows)
    got = {
        (int(r["conv_id"][1:]), r["turn_idx"]): (
            int(r["ts"].timestamp() - base.timestamp()), r["seq"]
        )
        for r in final_state(df).collect()
    }
    assert got == expect

    # all variants agree row-for-row
    a = lww_winners(df)
    for variant in (lww_winners_window, lww_winners_ord, lww_winners_salted):
        v = variant(df)
        assert a.exceptAll(v).count() == 0 and v.exceptAll(a).count() == 0
