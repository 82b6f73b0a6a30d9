"""Plan-shape regression guards for the round-6 entries.

Same discipline as test_round5_plans: no unsanctioned nested-loop /
cartesian joins; the broadcast-small cross joins that ARE sanctioned
(k-row centroid table, broadcast query set, single-row scalars) are
pinned to their exact counts so a regression to a real product
fails loudly.
"""

from __future__ import annotations


def test_round6_query_plan_shapes(spark):
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan_of(name):
        return (
            qs[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        )

    # pure equi-join / window / groupBy pipelines: no products at all
    for name in (
        "pq_code_dedup",
        "curriculum_order",
        "unigram_tokenize",
        "domain_filter",
        "repetition_screen_para",
        "kg_temporal_activity",
    ):
        p = plan_of(name)
        assert "NestedLoop" not in p and "CartesianProduct" not in p, name

    # dsir: round 7 removed the last join entirely — the 128-entry
    # lambda table is a literal array indexed per gram row, so the
    # plan must be JOIN-FREE (no SortMergeJoin ever sneaks the target
    # flag back in) and product-free
    p = plan_of("dsir_select")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert "NestedLoop" not in p and "CartesianProduct" not in p

    # sanctioned broadcast-small cross joins, pinned to their counts:
    # kmeans = one k-row centroid broadcast per assignment
    p = plan_of("kmeans_clusters")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 3  # one per Lloyd pass
    # hard negatives = the one broadcast query-set scan
    p = plan_of("hard_negatives")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") == 1
    # unimax = three single-row scalar broadcasts (budget, n, L*)
    p = plan_of("unimax_budget")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 3
    # fertility = one single-row (tokens x words) scalar broadcast
    # per tokenizer family
    p = plan_of("tokenizer_fertility")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 3

    # curriculum order is one window over one scan: no join operator
    p = plan_of("curriculum_order")
    assert "Join" not in p
