"""Gopher repetition screens (operators/repetition.py).

Reference analog: none (reference has no quality functions) — the
standard Rae-et-al repetition rules from the training-data brief.
"""

from __future__ import annotations

from batch_import_spark.operators.repetition import PPM, repetition_screen


def test_hand_computed_line_and_gram_metrics(spark):
    df = spark.createDataFrame(
        [
            # 3 lines, one repeated: dup_line = 1/3; line chars 3+3+3,
            # dup chars 3. tokens: a b a b -> top 2-gram "a b" x2,
            # mass = 2*3; chars("a b a b") = 7
            (0, "a b\na b\nc d"),
            # no repetition at all
            (1, "x y z"),
            # dup 5-gram: "a b c d e" twice (tokens a b c d e a b c d e)
            (2, "a b c d e a b c d e"),
        ],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in repetition_screen(df).collect()}

    d0 = out[0]
    assert d0.n_lines == 3
    assert d0.dup_line_ppm == PPM // 3
    assert d0.dup_line_char_ppm == (3 * PPM) // 9
    # text joins to "a b a b c d" (11 chars): "a b" twice -> 3*2=6
    assert d0.top2_gram_ppm == (6 * PPM) // 11

    d1 = out[1]
    assert (d1.n_lines, d1.dup_line_ppm, d1.dup_line_char_ppm) == (1, 0, 0)
    # every 2-gram unique: top mass = 1*len("x y")=3 over 5 chars
    assert d1.top2_gram_ppm == (3 * PPM) // 5
    assert d1.dup5_gram_ppm == 0

    d2 = out[2]
    # 19 chars; "a b c d e" appears twice (9 chars each) -> 18/19
    assert d2.dup5_gram_ppm == (2 * 9 * PPM) // 19
    # top 2-gram: "a b" x2 (also "b c" x2 ... tie-break smallest "a b")
    assert d2.top2_gram_ppm == (2 * 3 * PPM) // 19


def test_blank_and_short_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "word")], "doc_id: long, text: string"
    )
    rows = {r.doc_id: r for r in repetition_screen(df).collect()}
    # wordless docs dropped; single-word doc has no 2-grams
    assert set(rows) == {2}
    r = rows[2]
    assert (r.top2_gram_ppm, r.top3_gram_ppm, r.top4_gram_ppm, r.dup5_gram_ppm) == (
        0,
        0,
        0,
        0,
    )
    assert (r.n_lines, r.dup_line_ppm) == (1, 0)


def test_entry_query_non_vacuous(spark):
    """Planted boilerplate exercises the line metrics; the raw corpus
    exercises the n-gram metrics (the round-4 vacuity lesson)."""
    import __spark_entry__ as entry

    out = entry.queries()["repetition_screen"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    assert any(r.dup_line_ppm > 0 for r in out)
    assert any(r.dup_line_ppm == 0 for r in out)
    assert any(r.top2_gram_ppm > 0 for r in out)
    assert any(r.dup5_gram_ppm >= 0 for r in out)
