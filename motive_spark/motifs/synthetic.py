"""Self-validating synthetic experiment (--type synth, Synthetic.java).

The reference's own end-to-end harness (Run.java:183-217 →
Synthetic.main, Synthetic.java:98-130): wire ``n_instances`` copies of a
chosen motif into an ER noise graph at low-degree attachment points,
then check the extractor + scorer recover it with positive factors that
grow with the number of instances — the statistical-soundness proof.

``inject_motifs`` is the graph builder; ``synthetic_experiment`` runs
the sweep and aggregates factor means per (motif, n_instances)
(A14 — Synthetic.java:95-96, 360-366).
"""

from __future__ import annotations

import random as _random

from pyspark.sql import DataFrame, SparkSession

from motive_spark.graph.generate import random_edges
from motive_spark.mdl.score import score_motifs
from motive_spark.motifs import MotifExtractor
from motive_spark.motifs.canon import canonical_form, edges_to_mask


def inject_motifs(
    spark: SparkSession,
    motif_edges: list[tuple[int, int]],
    k: int,
    n_instances: int,
    n_noise: int = 200,
    m_noise: int = 400,
    seed: int = 42,
    max_degree: int = 5,
) -> DataFrame:
    """ER noise graph with ``n_instances`` copies of the motif wired in
    by the reference's instance placement (Synthetic.java:174-220):
    pick ``n_instances`` random noise vertices of degree <= ``max_degree``,
    REPLACE each with a fresh k-node motif copy, and rewire every
    external link of the replaced vertex to a motif position drawn from
    one shared random multinomial — the exact generative inverse of the
    MDL contraction, so recovery is a real statistical test (the planted
    copies inherit realistic external wiring instead of a single anchor
    edge).

    Instance vertex ids are ``n_noise + k*i + j``; occurrences are
    exactly the planted copies."""
    rng = _random.Random(seed)
    noise = [
        (r["src"], r["dst"])
        for r in random_edges(spark, n_noise, m_noise, seed=seed, directed=False).collect()
    ]
    adj: dict[int, set[int]] = {}
    pairs: set[tuple[int, int]] = set()
    for a, b in noise:
        if a == b:
            continue
        pairs.add((min(a, b), max(a, b)))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    candidates = sorted(
        v for v in range(n_noise) if len(adj.get(v, ())) <= max_degree
    )
    if len(candidates) < n_instances:
        raise ValueError(
            f"only {len(candidates)} nodes with degree <= {max_degree}, "
            f"need {n_instances} instances"
        )
    instances = rng.sample(candidates, n_instances)

    # one shared random multinomial over motif positions
    # (Functions.randomMultinomial(nPrime), Synthetic.java:193)
    raw = [rng.random() for _ in range(k)]
    tot = sum(raw)
    probs = [p / tot for p in raw]

    def choose_pos() -> int:
        x = rng.random()
        acc = 0.0
        for i, p in enumerate(probs):
            acc += p
            if x <= acc:
                return i
        return k - 1

    for i, v in enumerate(instances):
        new = [n_noise + k * i + j for j in range(k)]
        for a, b in motif_edges:
            pairs.add((min(new[a], new[b]), max(new[a], new[b])))
        for j in range(1, k):
            adj.setdefault(new[j], set())
        for u in sorted(adj.get(v, set())):
            pairs.discard((min(v, u), max(v, u)))
            t = new[choose_pos()]
            pairs.add((min(u, t), max(u, t)))
            adj[u].discard(v)
            adj[u].add(t)
            adj.setdefault(t, set()).add(u)
        adj.pop(v, None)
    return spark.createDataFrame(sorted(pairs), "src long, dst long")


def synthetic_experiment(
    spark: SparkSession,
    motif_edges: list[tuple[int, int]],
    k: int,
    instance_counts: list[int],
    samples: int = 2000,
    seed: int = 42,
    n_noise: int = 200,
    m_noise: int = 400,
    max_degree: int = 5,
) -> list[dict]:
    """factor_er of the planted motif for each instance count.

    Contract (reference Synthetic experiment): factors increase with
    n_instances and turn positive once the motif is frequent enough.
    """
    target = canonical_form(edges_to_mask(motif_edges, k, False), k)
    out = []
    for n_inst in instance_counts:
        edges = inject_motifs(
            spark, motif_edges, k, n_inst, n_noise, m_noise, seed=seed,
            max_degree=max_degree,
        )
        ex = MotifExtractor(
            edges, samples=samples, min_size=k, max_size=k, min_freq=1,
            seed=seed, directed=False,
        )
        scores = {
            r["canon"]: r
            for r in score_motifs(edges, ex.occurrences(), directed=False).collect()
        }
        rec = scores.get(target)
        out.append(
            {
                "n_instances": n_inst,
                "found": rec is not None,
                "factor_er": float(rec["factor_er"]) if rec is not None else None,
                "n_occurrences": int(rec["n_occurrences"]) if rec is not None else 0,
            }
        )
    return out
