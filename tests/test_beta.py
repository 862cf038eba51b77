"""Beta/DS model: the importance-sampling estimator must agree with
exact enumeration on small degree sequences (the ground-truth analogue
of the reference's 50-bit MC tolerance tests, MotifModelTest.java:66-97),
and the CI must be a sane upper bound."""

import math
from itertools import combinations

import numpy as np
import pytest


def exact_graph_count(deg_seq):
    """Brute-force: count simple graphs on n labeled vertices with the
    given degree sequence (n small)."""
    n = len(deg_seq)
    slots = list(combinations(range(n), 2))
    target = tuple(deg_seq)
    count = 0
    for m in range(len(slots) + 1):
        if sum(deg_seq) != 2 * m:
            continue
        for es in combinations(slots, m):
            deg = [0] * n
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            if tuple(deg) == target:
                count += 1
    return count


@pytest.mark.parametrize(
    "seq",
    [
        [1, 1, 2, 2],
        [2, 2, 2],          # triangle: exactly 1 graph
        [1, 1, 1, 1],       # two disjoint edges arrangements: 3 graphs
        [3, 2, 2, 2, 1],
        [2, 2, 2, 2, 2],    # 5-cycles + triangle+edge combos
    ],
)
def test_bd_estimator_matches_exact_count(seq):
    from motive_spark.mdl.beta import bd_log_count_samples

    want = exact_graph_count(seq)
    assert want > 0
    ln = bd_log_count_samples(None, seq, iterations=400, seed=7)
    est = float(np.mean(np.exp(ln)))
    assert math.isclose(est, want, rel_tol=0.15), (seq, est, want)


def test_lognormal_upper_bounds_mean():
    from motive_spark.mdl.beta import lognormal_upper

    rng = np.random.default_rng(3)
    mu, sigma = 2.0, 0.7
    true_ln_mean = mu + sigma**2 / 2
    covered = 0
    for _ in range(30):
        s = rng.normal(mu, sigma, size=50)
        if lognormal_upper(s, alpha=0.05) >= true_ln_mean:
            covered += 1
    assert covered >= 25  # ~95% coverage


def test_beta_codelength_spark_fanout(spark):
    """Spark-distributed sampling == local sampling structure; triangle's
    DS count is exactly 1 graph → log2(1)=0 plus L(D)."""
    from motive_spark.mdl.beta import beta_codelength
    from motive_spark.mdl.models import _degree_hist_entropy_bits

    bits = beta_codelength(spark, {2: 3}, iterations=20, alpha=0.05)
    ld = _degree_hist_entropy_bits(np.array([2.0]), np.array([3.0]))
    # exactly one triangle graph → count term ~ 0 bits (CI slack tiny)
    assert abs(bits - ld) < 0.2, (bits, ld)


def test_size_beta_on_planted_cliques(spark):
    from tests.conftest import edges_df
    from tests.test_kernels import random_pairs
    from motive_spark.mdl.beta import size_beta
    from motive_spark.motifs import MotifExtractor

    pairs = set(random_pairs(60, 120, seed=31, directed=False))
    for i in range(10):
        vs = [60 + 4 * i + j for j in range(4)]
        for a in range(4):
            for b in range(a + 1, 4):
                pairs.add((vs[a], vs[b]))
        pairs.add((i, vs[0]))
    edges = edges_df(spark, sorted(pairs))
    ex = MotifExtractor(edges, samples=1200, min_size=4, max_size=4, directed=False)
    out = size_beta(edges, ex.occurrences(), iterations=12)
    assert out
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    clique4 = canonical_form(
        edges_to_mask([(a, b) for a in range(4) for b in range(a + 1, 4)], 4, False), 4
    )
    by_canon = {r["canon"]: r for r in out}
    assert clique4 in by_canon
    best = max(out, key=lambda r: r["factor_beta"])
    assert best["canon"] == clique4


def exact_digraph_count(out_seq, in_seq):
    """Brute force: simple digraphs (no self-loops) with given sequences."""
    from itertools import combinations, product

    n = len(out_seq)
    slots = [(i, j) for i in range(n) for j in range(n) if i != j]
    m = sum(out_seq)
    count = 0
    for es in combinations(slots, m):
        od = [0] * n
        ind = [0] * n
        for a, b in es:
            od[a] += 1
            ind[b] += 1
        if od == list(out_seq) and ind == list(in_seq):
            count += 1
    return count


@pytest.mark.parametrize(
    "out_seq,in_seq",
    [
        ([1, 1, 1], [1, 1, 1]),
        ([2, 1, 0], [0, 1, 2]),
        ([2, 1, 1, 0], [1, 1, 1, 1]),
        ([1, 1, 1, 1], [2, 2, 0, 0]),
    ],
)
def test_bd_directed_matches_exact_count(out_seq, in_seq):
    from motive_spark.mdl.beta import bd_sample_log_count_directed

    want = exact_digraph_count(out_seq, in_seq)
    assert want > 0
    rngs = [np.random.default_rng((11, i)) for i in range(400)]
    ln = np.array(
        [bd_sample_log_count_directed(out_seq, in_seq, r) for r in rngs]
    )
    est = float(np.mean(np.exp(ln)))
    assert math.isclose(est, want, rel_tol=0.15), (out_seq, in_seq, est, want)


def test_size_beta_directed_matches_naive_oracle(spark):
    """Directed Beta scoring == naive weighted contraction: same joint
    (in, out) subbed histogram -> same seeded sampler draws -> sizes
    agree to float tolerance (MotifModel.java:161-208 path)."""
    from tests.conftest import edges_df
    from tests.mdl_oracle import naive_score
    from tests.test_kernels import random_pairs
    from motive_spark.mdl.beta import (
        beta_codelength_directed,
        motif_beta_hist,
        size_beta,
    )
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    pairs = random_pairs(20, 60, seed=17, directed=True)
    sym = {}
    for a, b in pairs:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    occ = None
    for v in sorted(sym):
        for u in sorted(sym[v]):
            third = sorted((sym[v] | sym[u]) - {v, u})
            if third:
                occ = sorted([v, u, third[0]])
                break
        if occ:
            break
    assert occ is not None

    local = {v: i for i, v in enumerate(occ)}
    motif_edges = sorted(
        {(local[a], local[b]) for a, b in pairs if a in local and b in local}
    )
    mask = edges_to_mask(motif_edges, 3, True)
    canon = canonical_form(mask, 3)
    e_df = edges_df(spark, pairs)
    occ_df = spark.createDataFrame(
        [(canon, 3, 0, [int(v) for v in occ], mask)],
        "canon long, k int, occ_id long, vertices array<long>, mask long",
    )
    got = size_beta(e_df, occ_df, directed=True, iterations=12, seed=5)
    assert len(got) == 1

    want_struct = naive_score(pairs, [occ], motif_edges, 3, True)
    sub_bits = beta_codelength_directed(
        None, motif_beta_hist(mask, 3, True), iterations=12, seed=5
    )
    subbed_bits = beta_codelength_directed(
        spark, want_struct["subbed_hist"], iterations=12, seed=5
    )
    want_size = sub_bits + subbed_bits + want_struct["common"]
    assert math.isclose(got[0]["size_beta"], want_size, abs_tol=1e-6), (
        got[0]["size_beta"],
        want_size,
    )


def test_beta_under_fibonacci_search(spark):
    """Beta runs under the occurrence-prefix search (Compare.java:307):
    rows exist for model='beta', the zero cutoff is always sampled, and
    the chosen size is <= the zero-cutoff size."""
    from tests.conftest import edges_df
    from tests.test_kernels import random_pairs
    from motive_spark.mdl.search import size_with_search
    from motive_spark.motifs import MotifExtractor

    pairs = set(random_pairs(40, 80, seed=23, directed=False))
    for i in range(6):  # plant triangles so something compresses
        vs = [40 + 3 * i + j for j in range(3)]
        pairs.update(
            [(vs[0], vs[1]), (vs[0], vs[2]), (vs[1], vs[2]), (i, vs[0])]
        )
    edges = edges_df(spark, sorted(pairs))
    ex = MotifExtractor(edges, samples=600, min_size=3, max_size=3, directed=False)
    occ = ex.occurrences()
    res = size_with_search(
        edges, occ, directed=False, model=("er", "beta"),
        max_depth=4, beta_iterations=8, beta_depth=2, seed=11,
    ).collect()
    by_model = {}
    for r in res:
        by_model.setdefault(r["model"], []).append(r)
    assert set(by_model) == {"er", "beta"}
    assert len(by_model["beta"]) == len(by_model["er"])
    for r in by_model["beta"]:
        assert math.isfinite(r["size"]) and r["cutoff"] >= 0
