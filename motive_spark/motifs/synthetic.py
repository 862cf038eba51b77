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
) -> DataFrame:
    """ER noise graph with ``n_instances`` disjoint copies of the motif
    wired in, each attached to a random noise vertex (Synthetic.java's
    low-degree instance placement, :174-220, simplified to fresh
    vertices — occurrences are exactly the planted copies)."""
    rng = _random.Random(seed)
    noise = [
        (r["src"], r["dst"])
        for r in random_edges(spark, n_noise, m_noise, seed=seed, directed=False).collect()
    ]
    pairs = set(noise)
    for i in range(n_instances):
        vs = [n_noise + k * i + j for j in range(k)]
        for a, b in motif_edges:
            pairs.add((min(vs[a], vs[b]), max(vs[a], vs[b])))
        pairs.add((rng.randrange(n_noise), vs[0]))
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
) -> list[dict]:
    """factor_er of the planted motif for each instance count.

    Contract (reference Synthetic experiment): factors increase with
    n_instances and turn positive once the motif is frequent enough.
    """
    target = canonical_form(edges_to_mask(motif_edges, k, False), k)
    out = []
    for n_inst in instance_counts:
        edges = inject_motifs(
            spark, motif_edges, k, n_inst, n_noise, m_noise, seed=seed
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
