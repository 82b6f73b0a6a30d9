"""End-to-end KG construction: extract → link → canonicalize → materialize.

The Spark-native replacement for the reference's import pipeline
(Importer.doImport, Importer.java:225-241): where the reference
streams CSV rows into Neo4j store files single-threaded, we run

    transcripts ──salted repartition──▶ extract (pandas/Arrow UDF)
        ──broadcast join alias dict──▶ linked mentions (+skip counts)
        ──CC over surface-equivalence─▶ canonical node ids
        ──write──▶ nodes / edges tables (Parquet dir or Iceberg)

Phase barriers mirror the reference (all nodes before rels,
Importer.java:227-233): the canonical mapping is materialized before
the edge join.

Scale design (100 TB / 1000 executors):
- hot-conversation skew is defused BEFORE the Python-kernel stage by a
  deterministic salted repartition on (conv_id, turn_idx) — no rand(),
  reproducible at any parallelism;
- the alias dictionary joins broadcast (J1/J2); if it outgrows the
  threshold AQE falls back to shuffle hash join, and
  spark.sql.adaptive.skewJoin splits hot keys;
- canonicalization cost is bounded by the alias dict size (surfaces),
  NOT the transcript corpus — CC runs on the dictionary's equivalence
  graph, then broadcast-maps onto mention endpoints;
- edges are deduplicated to the (subj, pred, obj) triple grain with an
  occurrence count, so output size is vocabulary-bounded; provenance
  stays available pre-dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from batch_import_spark.operators.canonicalize import canonical_mapping
from batch_import_spark.operators.ids import stable_id
from batch_import_spark.operators.linking import build_unique_alias_dict
from batch_import_spark.pipeline.extract import extract_mentions


@dataclass
class KgResult:
    nodes: DataFrame  # node_id, surfaces array<string>, kind, entity_id
    edges: DataFrame  # subj_id, pred, obj_id, n_occurrences, first/last provenance
    triples: DataFrame  # (subj, pred, obj) as canonical SURFACE strings (P/R surface)
    metrics: dict = field(default_factory=dict)


def salted_repartition(df: DataFrame, num_partitions: int, *keys: str, salt_buckets: int = 64) -> DataFrame:
    """Deterministic skew-defusing repartition.

    Salt = xxhash64 of ALL key columns (e.g. conv_id + turn_idx), so a
    hot conv_id spreads over ``salt_buckets`` buckets while staying
    reproducible (no rand()).
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(salt_buckets))
    return df.repartition(num_partitions, salt)


def link_mentions(
    mentions: DataFrame, alias_dict: DataFrame
) -> tuple[DataFrame, Observation]:
    """Resolve mention surfaces through the unique-key alias dict.

    Reference J1 semantics: ambiguous surface (getSingle≠1) and unknown
    surface both fail resolution; a mention with ANY unresolved side is
    skipped and counted (P7).
    """
    uniq = build_unique_alias_dict(
        alias_dict, key_col="key_value", id_col="entity_id", extra_cols=["kind"]
    ).select("key_value", "entity_id")

    subj_d = F.broadcast(uniq.select(F.col("key_value").alias("subj_surface"),
                                     F.col("entity_id").alias("subj_entity")))
    obj_d = F.broadcast(uniq.select(F.col("key_value").alias("obj_surface"),
                                    F.col("entity_id").alias("obj_entity")))
    joined = mentions.join(subj_d, "subj_surface", "left").join(obj_d, "obj_surface", "left")

    obs = Observation("linking")
    observed = joined.observe(
        obs,
        F.count(F.lit(1)).alias("n_mentions"),
        F.sum((F.col("subj_entity").isNotNull() & F.col("obj_entity").isNotNull()).cast("long")).alias("n_linked"),
        F.sum((F.col("subj_entity").isNull() | F.col("obj_entity").isNull()).cast("long")).alias("n_skipped"),
    )
    linked = observed.where(F.col("subj_entity").isNotNull() & F.col("obj_entity").isNotNull())
    return linked, obs


def canonicalize_surfaces(alias_dict: DataFrame) -> DataFrame:
    """(surface → canonical surface + canonical node id) via CC.

    Equivalence: two surfaces naming the same entity_id merge.
    Ambiguous surfaces (>1 entity) are EXCLUDED from equivalence edges
    (reference getSingle semantics) — they never link, so they never
    merge entities either. Canonical surface = lexicographic min in the
    component (order-free, deterministic); canonical node id = stable
    hash of that surface.
    """
    uniq = build_unique_alias_dict(alias_dict, key_col="key_value", id_col="entity_id")
    pairs = uniq.select(
        F.col("key_value").alias("surface"),
        F.col("entity_id"),
        stable_id(F.col("key_value")).alias("surface_id"),
    )
    cc = canonical_mapping(pairs, node_col="surface_id", key_col="entity_id")
    # map component ids back to a canonical *surface* (min surface string
    # in the component) for a human-stable identity
    with_comp = pairs.join(cc, pairs.surface_id == cc.node_id).select(
        "surface", "entity_id", "canonical_id"
    )
    canon_surface = with_comp.groupBy("canonical_id").agg(
        F.min("surface").alias("canonical_surface")
    )
    return (
        with_comp.join(canon_surface, "canonical_id")
        .select(
            "surface",
            "entity_id",
            F.col("canonical_surface"),
            stable_id(F.col("canonical_surface")).alias("canonical_node_id"),
        )
    )


def run_kg_pipeline(
    transcripts: DataFrame,
    alias_dict: DataFrame,
    num_partitions: int | None = None,
    nodes_out: str | None = None,
    edges_out: str | None = None,
) -> KgResult:
    """Run the full pipeline; optionally materialize Parquet tables."""
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    t = salted_repartition(transcripts, num_partitions, "conv_id", "turn_idx")

    obs_turns = Observation("turns")
    t = t.observe(obs_turns, F.count(F.lit(1)).alias("n_turns"))

    mentions = extract_mentions(t)
    linked, obs_link = link_mentions(mentions, alias_dict)

    canon = canonicalize_surfaces(alias_dict)
    canon_b = F.broadcast(
        canon.select("surface", "canonical_surface", "canonical_node_id")
    )

    resolved = (
        linked.join(
            canon_b.select(
                F.col("surface").alias("subj_surface"),
                F.col("canonical_surface").alias("subj"),
                F.col("canonical_node_id").alias("subj_id"),
            ),
            "subj_surface",
        )
        .join(
            canon_b.select(
                F.col("surface").alias("obj_surface"),
                F.col("canonical_surface").alias("obj"),
                F.col("canonical_node_id").alias("obj_id"),
            ),
            "obj_surface",
        )
    )

    # triple grain: map-side partial agg keeps the shuffle tiny
    edges = resolved.groupBy("subj_id", "subj", "pred", "obj_id", "obj").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min(F.struct("conv_id", "turn_idx")).alias("first_seen"),
        F.max(F.struct("conv_id", "turn_idx")).alias("last_seen"),
    )
    triples = edges.select("subj", "pred", "obj")

    nodes = (
        canon.groupBy(F.col("canonical_node_id").alias("node_id"))
        .agg(
            F.min("canonical_surface").alias("name"),
            F.sort_array(F.collect_set("surface")).alias("surfaces"),
            F.min("entity_id").alias("entity_id"),
        )
    )

    metrics: dict = {}
    if nodes_out:
        nodes.write.mode("overwrite").parquet(nodes_out)
        nodes = spark.read.parquet(nodes_out)
    if edges_out:
        edges.write.mode("overwrite").parquet(edges_out)
        edges = spark.read.parquet(edges_out)
        triples = edges.select("subj", "pred", "obj")
        # metrics only become available after an action has run
        metrics = {**obs_turns.get, **obs_link.get}

    return KgResult(nodes=nodes, edges=edges, triples=triples, metrics=metrics)
