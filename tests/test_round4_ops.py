"""Round-4 third-wave operators: hand-computed fixtures + invariants.

Link prediction (RA index), token-budget context sizing, winnowing
fingerprints (vs a pure-Python reference), negative-sampling protocol.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _h60(s: str) -> int:
    """Python twin of sketches.portable_hash60."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_link_prediction_path_graph(spark):
    from batch_import_spark.operators.graph_stats import link_prediction_scores

    # path a-b-c-d: candidates (a,c) via b, (b,d) via c, (a,d) none
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src: string, dst: string"
    )
    got = {(r.u, r.v): (r.n_common, r.ra_ppm) for r in link_prediction_scores(e).collect()}
    # deg(b) = deg(c) = 2 -> ra = 10^6 div 2
    assert got == {("a", "c"): (1, 500000), ("b", "d"): (1, 500000)}
    # hub cap: dropping centers with degree > 1 leaves no candidates
    assert link_prediction_scores(e, max_degree=1).count() == 0


def test_context_within_budget_hand_case(spark):
    from batch_import_spark.operators.conversations import context_within_budget

    # one conv, token counts 4, 3, 5, 2; budget 8
    rows = [("c", 1, "a b c d"), ("c", 2, "a b c"), ("c", 3, "a b c d e"), ("c", 4, "a b")]
    df = spark.createDataFrame(rows, "conv_id: string, turn_idx: int, text: string")
    got = {r.turn_idx: (r.n_ctx_turns, r.ctx_tokens) for r in
           context_within_budget(df, budget=8).collect()}
    # turn1: none; turn2: [4]<=8 -> 1 turn, 4 tok; turn3: [3,4]=7<=8 -> 2, 7
    # turn4: [5]<=8, [5,3]=8<=8, [5,3,4]=12>8 -> 2 turns, 8 tok
    assert got == {1: (0, 0), 2: (1, 4), 3: (2, 7), 4: (2, 8)}


def _winnow_reference(text: str, k: int, w: int):
    norm = " ".join(text.lower().strip().split())
    hashes = [_h60(norm[i : i + k]) for i in range(len(norm) - k + 1)]
    sel = set()
    for start in range(len(hashes) - w + 1):
        window = hashes[start : start + w]
        m = min(window)
        # rightmost minimal position in the window
        pos = max(i for i, h in enumerate(window) if h == m)
        sel.add((start + pos, m))
    return len(hashes), {h for _, h in sel}


def test_winnowing_matches_python_reference(spark):
    from batch_import_spark.operators.dedup import winnowing_sketch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my   box with five dozen liquor jugs",
        "aaaaaaaaaaaaaaaa",  # degenerate: identical grams everywhere
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = {r.doc_id: r for r in winnowing_sketch(df, k=8, window=4).collect()}
    for i, t in enumerate(texts):
        n_grams, sel = _winnow_reference(t, 8, 4)
        xor = 0
        for h in sel:
            xor ^= h
        assert got[i].n_grams == n_grams
        assert got[i].n_selected == len(sel)
        assert got[i].sketch_xor == xor
    # identical docs -> identical sketches
    df2 = spark.createDataFrame([(0, texts[0]), (1, texts[0])], "doc_id: long, text: string")
    a, b = sorted(winnowing_sketch(df2).collect(), key=lambda r: r.doc_id)
    assert (a.n_grams, a.n_selected, a.sketch_xor) == (b.n_grams, b.n_selected, b.sketch_xor)


def test_negative_samples_protocol(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    neg = entry._kg_negative_samples(spark, sf)
    rows = neg.collect()
    assert rows and all(r.k in (0, 1) for r in rows)
    # filtered protocol: no emitted negative is a true triple
    from batch_import_spark.pipeline.kg import run_kg_pipeline
    from batch_import_spark.sources.transcripts import alias_dict_df

    triples = {
        (r.subj, r.pred, r.obj)
        for r in run_kg_pipeline(
            entry._planted_transcripts_full(spark, sf).drop("ts"),
            alias_dict_df(spark),
        ).edges.select("subj", "pred", "obj").collect()
    }
    assert all((r.subj, r.pred, r.neg_obj) not in triples for r in rows)
    # deterministic: second run identical
    again = {(r.subj, r.pred, r.neg_obj, r.k) for r in entry._kg_negative_samples(spark, sf).collect()}
    assert again == {(r.subj, r.pred, r.neg_obj, r.k) for r in rows}


def test_mad_outliers_hand_case(spark):
    from batch_import_spark.operators.robust import mad_outlier_stats

    # group g: values 1..9 and one wild 100 -> n=10, lower med = 5,
    # devs |v-5| = 4,3,2,1,0,1,2,3,4,95 sorted 0,1,1,2,2,3,3,4,4,95
    # -> lower MAD (5th) = 2; outliers: dev > 6 -> only 95
    rows = [("g", float(v)) for v in range(1, 10)] + [("g", 100.0)]
    df = spark.createDataFrame(rows, "event_type: string, value: double")
    r = mad_outlier_stats(df, ["event_type"], "value").collect()[0]
    assert (r.n, r.med_micro, r.mad_micro, r.n_outliers) == (
        10, 5_000_000, 2_000_000, 1
    )


def test_round4_query_plan_shapes(spark):
    """Plan regression guards for the round-4 entries: no nested-loop
    or cartesian joins anywhere; the BPE apply path stays a
    zero-Exchange narrow map (the whole point of the replace-chain
    encoding)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan_of(name):
        return qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()

    for name in (
        "lm_bigram_score",
        "bloom_membership",
        "cms_heavy_hitters",
        "split_leakage_audit",
        "context_token_budget",
        "winnowing_sketch",
        "cdc_chunks",
        "mad_outliers",
        "rolling_fingerprint",
    ):
        p = plan_of(name)
        assert "NestedLoop" not in p and "Cartesian" not in p, name

    # zero-shuffle invariants: tokenize + both fingerprint/chunk maps.
    # cdc_chunks and bpe_tokenize (round 7) allow exactly one
    # ROUND-ROBIN repartition: their Arrow kernels fan the narrow
    # input out to the session's parallelism when the source collapses
    # to fewer scan partitions — a fixed-width fan-out, not a keyed
    # shuffle.
    import re as _re

    for name in ("rolling_fingerprint", "cdc_chunks", "bpe_tokenize"):
        plan = plan_of(name)
        exchanges = _re.findall(r"Exchange \w+", plan)
        assert all("RoundRobinPartitioning" in e for e in exchanges), plan
        assert len(exchanges) <= 1, plan
