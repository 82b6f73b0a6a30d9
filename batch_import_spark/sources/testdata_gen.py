"""Reference-format CSV test-data generator (G4, TestDataGenerator.java:17-80).

Writes nodes.csv / rels.csv with the reference's exact headers
(TestDataGenerator.java:32,34):

    Node\\tRels\\tProperty\\tLabel:label\\tCounter:int
    Start\\tEnde\\tType\\tProperty\\tCounter:long

Deterministic (seeded integer hashing instead of java.util.Random —
same shape, reproducible): random mode draws endpoints uniformly over
[0, n_nodes) (:47-61); sorted mode keeps target ≥ source (:62-80).
Feeds the ImporterIntegrationTest port (generate → import → verify).
"""

from __future__ import annotations

LABELS = ["Male", "Female", "Both", "None"]
TYPES = ["ONE", "TWO", "THREE"]


def _h(seed: int, *xs: int) -> int:
    v = seed & 0xFFFFFFFFFFFFFFFF
    for x in xs:
        v ^= (x + 0x9E3779B97F4A7C15 + (v << 6) + (v >> 2)) & 0xFFFFFFFFFFFFFFFF
        v &= 0xFFFFFFFFFFFFFFFF
    return v


def generate_reference_csv(
    out_dir: str,
    n_nodes: int = 1000,
    rels_per_node: int = 10,
    sorted_mode: bool = False,
    seed: int = 42,
) -> tuple[str, str]:
    """Write nodes.csv + rels.csv; returns their paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    nodes_path = os.path.join(out_dir, "nodes.csv")
    rels_path = os.path.join(out_dir, "rels.csv")

    with open(nodes_path, "w", encoding="utf-8") as f:
        f.write("Node\tRels\tProperty\tLabel:label\tCounter:int\n")
        for i in range(n_nodes):
            n_rels = _h(seed, i, 1) % rels_per_node
            label = LABELS[_h(seed, i, 2) % len(LABELS)]
            f.write(f"node{i}\t{n_rels}\tTEST{i}\t{label}\t{i}\n")

    counter = 0
    with open(rels_path, "w", encoding="utf-8") as f:
        f.write("Start\tEnde\tType\tProperty\tCounter:long\n")
        for i in range(n_nodes):
            n_rels = _h(seed, i, 1) % rels_per_node
            for r in range(n_rels):
                if sorted_mode:
                    # target ≥ source (TestDataGenerator.java:62-80)
                    target = i + (_h(seed, i, r, 3) % max(1, n_nodes - i))
                else:
                    target = _h(seed, i, r, 4) % n_nodes
                rel_type = TYPES[_h(seed, i, r, 5) % len(TYPES)]
                f.write(f"{i}\t{target}\t{rel_type}\tProp{counter}\t{counter}\n")
                counter += 1
    return nodes_path, rels_path
