"""WordPiece tokenizer (functions/wordpiece.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_import_spark.functions.wordpiece import (
    SEP,
    collect_vocab,
    segment_word_expr,
    wordpiece_tokenize,
    wordpiece_vocab,
)


def _fixture(spark):
    return spark.createDataFrame(
        [(0, "hello hell he"), (1, "hello world"), (2, "  "), (3, None)],
        "doc_id long, text string",
    )


def test_vocab_hand_counts(spark):
    v = {(r.kind, r.piece): r for r in
         wordpiece_vocab(_fixture(spark), n_multi=5).collect()}
    # 'he': init prefix of hello(x2), hell, he -> weight 4
    assert v[("init", "he")].weight == 4 and not v[("init", "he")].is_char
    # chars always kept with NULL rank
    assert v[("init", "h")].is_char and v[("init", "h")].kept_rank is None
    assert v[("cont", "l")].weight == 7  # ll in hello x2 + hell, l at end...
    # multi cap respected
    assert sum(1 for k in v if not v[k].is_char) == 5


def test_greedy_longest_match_and_unk(spark):
    v = wordpiece_vocab(_fixture(spark), n_multi=5)
    init, cont = collect_vocab(v)
    seg = (
        spark.createDataFrame(
            [("hello",), ("he",), ("zebra",)], "word string"
        )
        .select("word", segment_word_expr(F.col("word"), init, cont).alias("s"))
        .collect()
    )
    got = {r.word: (r.s.seg, r.s.np) for r in seg}
    # longest init piece at pos 1 is 'hel' (rank 5 kept), then chars
    assert got["hello"] == (f"hel{SEP}##l{SEP}##o", 3)
    assert got["he"] == ("he", 1)
    # 'z' never observed word-initially -> whole word is [UNK]
    assert got["zebra"] == ("[UNK]", 1)


def test_tokenize_doc_rollup_and_blank_parity(spark):
    docs = _fixture(spark)
    init, cont = collect_vocab(wordpiece_vocab(docs, n_multi=5))
    rows = {r.doc_id: r for r in wordpiece_tokenize(docs, init, cont).collect()}
    # blank/NULL docs dropped (oracle word-join parity)
    assert set(rows) == {0, 1}
    # doc 0: hello(3) hell(2: hel ##l) he(1) = 6
    assert rows[0].n_wp_tokens == 6
    assert rows[1].n_wp_tokens == 8  # hello(3) + world(5 chars)


def test_full_char_coverage_on_corpus(spark):
    """Every corpus word segments without UNK: single-char pieces of
    both kinds are always kept."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    init, cont = collect_vocab(wordpiece_vocab(docs, n_multi=50))
    toks = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda w: w != F.lit("")
    )
    words = docs.select(F.explode(toks).alias("word")).distinct()
    segd = words.select(
        "word", segment_word_expr(F.col("word"), init, cont).alias("s")
    )
    assert segd.where(F.col("s.seg") == "[UNK]").count() == 0
    # reconstruction: stripping SEP and '##' recovers the word
    bad = segd.where(
        F.replace(F.replace(F.col("s.seg"), F.lit(SEP), F.lit("")),
                  F.lit("##"), F.lit("")) != F.col("word")
    ).count()
    assert bad == 0
