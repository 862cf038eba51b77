"""Random-graph sources + the reference's self-validating synthetic
experiment: planted-motif factors must grow with instance count
(Synthetic.java contract, SURVEY §3.3)."""

import pytest
from pyspark.sql import functions as F


def test_random_edges_deterministic_and_simple(spark):
    from motive_spark.graph.generate import random_edges

    a = random_edges(spark, 100, 300, seed=5).collect()
    b = random_edges(spark, 100, 300, seed=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r.src != r.dst for r in a)
    assert len(a) == len({(r.src, r.dst) for r in a})
    c = random_edges(spark, 100, 300, seed=6).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_random_edges_p_density(spark):
    from motive_spark.graph.generate import random_edges_p

    e = random_edges_p(spark, 60, 0.2, seed=3, directed=False)
    m = e.count()
    possible = 60 * 59 / 2
    assert 0.15 * possible < m < 0.25 * possible


def test_preferential_attachment_shape(spark):
    from motive_spark.graph.generate import preferential_attachment
    from motive_spark.graph import degrees

    e = preferential_attachment(spark, 120, m_per_node=2, seed=9)
    deg = degrees(e, directed=False).toPandas()
    # heavy tail: max degree well above the median
    assert deg["deg"].max() >= 4 * deg["deg"].median()


def test_synthetic_experiment_factor_grows(spark):
    from motive_spark.motifs.synthetic import synthetic_experiment

    clique4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    res = synthetic_experiment(
        spark, clique4, 4, instance_counts=[2, 14], samples=1500,
        n_noise=120, m_noise=240,
    )
    assert all(r["found"] for r in res)
    lo, hi = res[0], res[1]
    assert hi["factor_er"] > lo["factor_er"]
    assert hi["factor_er"] > 0  # many instances ⇒ genuine compression
