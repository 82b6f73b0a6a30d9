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


def test_paragraph_grain_and_multi_dup_ns(spark):
    """Paragraph separator + the Gopher 6..10-gram duplicate masses
    (repetition_screen_para entry shape): a doc of 3 paragraphs with
    one repeated, whose repeated paragraph also mints duplicated
    6/8/10-grams."""
    para = "p q r s t u v w x y"  # 10 tokens, 19 chars
    text = "alpha beta\n\n" + para + "\n\n" + para
    df = spark.createDataFrame(
        [(0, text), (1, "one two three")], "doc_id: long, text: string"
    )
    out = {
        r.doc_id: r
        for r in repetition_screen(
            df, line_sep="\n\n", top_ns=(2,), dup_ns=(6, 8, 10)
        ).collect()
    }
    d0 = out[0]
    assert d0.n_lines == 3
    assert d0.dup_line_ppm == PPM // 3
    # tokens: alpha beta + 2x para = 22 tokens; joined chars 10+1+19+1+19=50
    # dup 6-grams: the 5 six-grams inside para occur twice (11 chars each)
    assert d0.dup6_gram_ppm == (5 * 2 * 11 * PPM) // 50
    # dup 8-grams: 3 per para copy, 15 chars each
    assert d0.dup8_gram_ppm == (3 * 2 * 15 * PPM) // 50
    # dup 10-grams: exactly the para itself, twice
    assert d0.dup10_gram_ppm == (2 * 19 * PPM) // 50
    d1 = out[1]
    assert (d1.n_lines, d1.dup6_gram_ppm, d1.dup8_gram_ppm, d1.dup10_gram_ppm) == (
        1, 0, 0, 0,
    )
