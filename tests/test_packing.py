"""Chunking + sequence packing (operators/packing.py)."""

import pytest

from batch_import_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
    token_count,
)


def test_chunk_documents_windows_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "xy"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_len=4, overlap=1).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_n_chars"]) for r in out}
    # stride 3: starts 1,4,7,10 for len 10
    assert got[(1, 0)] == ("abcd", 4)
    assert got[(1, 1)] == ("defg", 4)
    assert got[(1, 2)] == ("ghij", 4)
    assert got[(1, 3)] == ("j", 1)  # contained tail kept by contract
    assert got[(2, 0)] == ("xy", 2)
    assert {d for d, _ in got} == {1, 2}  # empty + null emit nothing


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_len=4, overlap=4)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "  Hello   world "), (2, ""), (3, "one")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 2, 2: 0, 3: 1}


def _greedy(sizes, capacity):
    packs, pack, fill = [], 0, 0
    for i, s in enumerate(sizes):
        if i and fill + s > capacity:
            pack, fill = pack + 1, 0
        packs.append(pack)
        fill += s
    return packs


def test_pack_sequences_greedy_within_groups(spark):
    rows = [(i, f"doc{i}", 30 + (i * 13) % 80) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, name string, n_tok long")
    out = pack_sequences(
        df, "n_tok", ["doc_id"], capacity=128, n_groups=4, seed=5
    ).collect()
    assert len(out) == 40
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group_id"], []).append(r)
    assert set(by_group) <= set(range(4))
    for g, members in by_group.items():
        # replay greedy in (pack_id, pack_pos) order — the operator's
        # declared intra-group order
        members.sort(key=lambda r: (r["pack_id"], r["pack_pos"]))
        expect = _greedy([r["size"] for r in members], 128)
        assert [r["pack_id"] for r in members] == expect
        # no pack overflows except single-item oversize packs
        fills: dict[int, int] = {}
        for r in members:
            fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["size"]
        for pid, f in fills.items():
            n_items = sum(1 for r in members if r["pack_id"] == pid)
            assert f <= 128 or n_items == 1


def test_pack_sequences_oversize_item_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 500), (2, 10), (3, 10)], "doc_id long, n_tok long"
    )
    out = pack_sequences(df, "n_tok", ["doc_id"], capacity=100, n_groups=1).collect()
    oversize = [r for r in out if r["size"] == 500][0]
    assert oversize["pack_pos"] == 0
    assert sum(1 for r in out if r["pack_id"] == oversize["pack_id"]) == 1


def test_pack_sequences_deterministic(spark):
    rows = [(i, 10 + i % 7) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    a = sorted(map(tuple, pack_sequences(df, "n_tok", ["doc_id"], 64, 4, seed=1).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                df.repartition(7), "n_tok", ["doc_id"], 64, 4, seed=1
            ).collect(),
        )
    )
    assert a == b


def test_global_packing_capacity_invariant_and_waste(spark):
    """pack_sequences_global: the capacity invariant holds over FINAL
    bins (except oversize singletons), every input row survives, and
    measured waste is never worse than level-1 packing alone."""
    from pyspark.sql import functions as F

    from batch_import_spark.operators.packing import (
        pack_sequences,
        pack_sequences_global,
        packing_waste,
    )

    cap = 100
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(60)) + 1).alias("n_tok"),
    )
    g = pack_sequences_global(df, "n_tok", ["doc_id"], capacity=cap, n_groups=8)
    rows = g.collect()
    assert len(rows) == 500  # nothing dropped
    fills = {}
    for r in rows:
        fills.setdefault((r["bin_group"], r["bin_pack"]), []).append(r["size"])
    for key, sizes in fills.items():
        assert sum(sizes) <= cap or (len(sizes) == 1 and sizes[0] > cap), key
    w1 = packing_waste(
        pack_sequences(df, "n_tok", ["doc_id"], capacity=cap, n_groups=8),
        cap, ["group_id", "pack_id"],
    ).collect()[0]
    w2 = packing_waste(g, cap, ["bin_group", "bin_pack"]).collect()[0]
    assert w2["total_size"] == w1["total_size"]
    assert w2["n_bins"] <= w1["n_bins"]
    assert w2["waste"] <= w1["waste"]
    assert w2["waste_ppm"] <= w1["waste_ppm"]


def test_global_packing_deterministic_across_partitionings(spark):
    from pyspark.sql import functions as F

    from batch_import_spark.operators.packing import pack_sequences_global

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(9)), F.lit(40)) + 1).alias("n_tok"),
    )
    a = pack_sequences_global(df.repartition(3), "n_tok", ["doc_id"], 128, n_groups=4)
    b = pack_sequences_global(df.repartition(13), "n_tok", ["doc_id"], 128, n_groups=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cdc_chunks_stable_under_insertion(spark):
    """The CDC selling point: an insertion at the front changes only
    the chunks near it — the tail chunk hashes are shared. Fixed-size
    chunking would shift every boundary."""
    from batch_import_spark.operators.packing import cdc_chunks

    base = (
        "the quick brown fox jumps over the lazy dog while "
        "pack my box with five dozen liquor jugs and then "
        "sphinx of black quartz judge my vow again and again and again"
    )
    edited = "INSERTED PREFIX " + base
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id: long, text: string"
    )
    out = cdc_chunks(df, gram=8, mask=16)
    a = [r.chunk_md5 for r in out.where("doc_id = 0").orderBy("chunk_idx").collect()]
    b = [r.chunk_md5 for r in out.where("doc_id = 1").orderBy("chunk_idx").collect()]
    shared = set(a) & set(b)
    assert len(a) > 2 and len(b) > 2
    # the tail re-synchronizes: most of the original chunks survive
    assert len(shared) >= len(a) - 2
    # chunks reassemble exactly: total length == normalized doc length
    import pyspark.sql.functions as F

    total = {r.doc_id: r.s for r in out.groupBy("doc_id").agg(
        F.sum("chunk_len").alias("s")).collect()}
    assert total[0] == len(" ".join(base.lower().split()))
    assert total[1] == len(" ".join(edited.lower().split()))
