"""Transcript analytics (operators/conversations.py)."""

import datetime

from batch_import_spark.operators.conversations import (
    assemble_context,
    conversation_stats,
    mine_sft_pairs,
    tool_transitions,
)

_TS = datetime.datetime(2025, 1, 1, 0, 0, 0)


def _turn(conv, idx, role, text, tool=None, secs=0):
    return (conv, idx, role, text, tool, _TS + datetime.timedelta(seconds=secs))

_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_tool_transitions_skip_non_tool_turns(spark):
    df = spark.createDataFrame(
        [
            _turn("c1", 0, "user", "q"),
            _turn("c1", 1, "tool", "r1", "search"),
            _turn("c1", 2, "assistant", "a"),
            _turn("c1", 3, "tool", "r2", "browse"),
            _turn("c1", 4, "tool", "r3", "search"),
            _turn("c2", 0, "tool", "x", "search"),
            _turn("c2", 1, "tool", "y", "browse"),
        ],
        _SCHEMA,
    )
    got = {
        (r["prev_tool"], r["tool"]): r["n_transitions"]
        for r in tool_transitions(df).collect()
    }
    assert got == {("search", "browse"): 2, ("browse", "search"): 1}


def test_assemble_context_window(spark):
    df = spark.createDataFrame(
        [_turn("c1", i, "user", f"t{i}") for i in range(5)]
        + [_turn("c2", 0, "user", "solo")],
        _SCHEMA,
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["context"]
        for r in assemble_context(df, k=3).collect()
    }
    assert got[("c1", 0)] == ""
    assert got[("c1", 1)] == "t0"
    assert got[("c1", 3)] == "t0\nt1\nt2"
    assert got[("c1", 4)] == "t1\nt2\nt3"  # window slides, k bounded
    assert got[("c2", 0)] == ""


def test_conversation_stats(spark):
    df = spark.createDataFrame(
        [
            _turn("c1", 0, "user", "hello there", secs=0),
            _turn("c1", 1, "assistant", "hi", secs=30),
            _turn("c1", 2, "tool", "result one two", "search", secs=90),
            _turn("c2", 0, "user", "", secs=0),
        ],
        _SCHEMA,
    )
    got = {r["conv_id"]: r for r in conversation_stats(df).collect()}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"], c1["n_tool_calls"]) == (3, 1, 1, 1)
    assert c1["n_tokens"] == 2 + 1 + 3
    assert c1["span_seconds"] == 90
    c2 = got["c2"]
    assert (c2["n_turns"], c2["n_tokens"], c2["span_seconds"]) == (1, 0, 0)


def test_mine_sft_pairs_crosses_tool_turns(spark):
    """Round-4 VERDICT fix: the pairing must cross tool turns, must
    not pair across an intervening user turn, and must drop user
    turns with no assistant answer."""
    df = spark.createDataFrame(
        [
            # c1: user -> tool -> tool -> assistant (pairs across 2 tools)
            _turn("c1", 0, "user", "q1"),
            _turn("c1", 1, "tool", "r1", "search"),
            _turn("c1", 2, "tool", "r2", "browse"),
            _turn("c1", 3, "assistant", "a1"),
            # c1: user -> assistant (plain adjacency still pairs)
            _turn("c1", 4, "user", "q2"),
            _turn("c1", 5, "assistant", "a2"),
            # c2: user -> user -> assistant (only the SECOND user pairs;
            # the first has an intervening user turn)
            _turn("c2", 0, "user", "stale"),
            _turn("c2", 1, "user", "q3"),
            _turn("c2", 2, "assistant", "a3"),
            # c2: trailing user with no answer -> dropped
            _turn("c2", 3, "user", "unanswered"),
        ],
        _SCHEMA,
    )
    got = {
        (r.conv_id, r.prompt_idx): (r.response_idx, r.prompt, r.response)
        for r in mine_sft_pairs(df).collect()
    }
    assert got == {
        ("c1", 0): (3, "q1", "a1"),
        ("c1", 4): (5, "q2", "a2"),
        ("c2", 1): (2, "q3", "a3"),
    }


def test_sft_pairs_entry_non_vacuous(spark):
    """The registry query itself must exercise real rows on the sf
    fixtures (the round-4 vacuity defect)."""
    import __spark_entry__ as entry

    n = entry.queries()["sft_pairs"](spark, "/root/testdata/sf0.001").count()
    assert n > 0
