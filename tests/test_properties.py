"""Property-based tests (hypothesis) for the foundational invariants:
canonization, code lengths, CSR layout, and histogram percentiles.

Pure-python properties run hundreds of random cases; Spark-backed
properties run a handful (JVM round-trips are the cost)."""

import math
from itertools import permutations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from motive_spark.mdl.codes import (
    log2_choose,
    online_multiset_bits,
    store_integers_bits,
)
from motive_spark.motifs.canon import (
    canonical_form,
    edges_to_mask,
    mask_to_edges,
)


def _permute_mask(mask: int, k: int, perm: tuple) -> int:
    out = 0
    for i in range(k):
        for j in range(k):
            if mask >> (perm[i] * k + perm[j]) & 1:
                out |= 1 << (i * k + j)
    return out


@given(
    k=st.integers(min_value=2, max_value=5),
    data=st.data(),
)
@settings(max_examples=150, deadline=None)
def test_canonical_form_permutation_invariant(k, data):
    """canon(mask) is invariant under vertex relabeling, idempotent,
    and never exceeds the input mask (it is the coset MINIMUM)."""
    mask = data.draw(st.integers(min_value=0, max_value=(1 << (k * k)) - 1))
    perm = data.draw(st.permutations(range(k)))
    c = canonical_form(mask, k)
    assert canonical_form(_permute_mask(mask, k, tuple(perm)), k) == c
    assert canonical_form(c, k) == c
    assert c <= mask
    # the canon really is the minimum over the whole coset
    assert c == min(
        _permute_mask(mask, k, p) for p in permutations(range(k))
    )


@given(
    k=st.integers(min_value=2, max_value=6),
    directed=st.booleans(),
    data=st.data(),
)
@settings(max_examples=120, deadline=None)
def test_edges_mask_roundtrip(k, directed, data):
    pairs = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, k - 1), st.integers(0, k - 1)
            ).filter(lambda t: t[0] != t[1]),
            max_size=k * (k - 1),
        )
    )
    m = edges_to_mask(pairs, k, directed)
    back = mask_to_edges(m, k, directed)
    assert edges_to_mask(back, k, directed) == m
    if directed:
        assert set(back) == set(pairs)
    else:
        assert set(back) == {(min(a, b), max(a, b)) for a, b in pairs}


@given(
    seq=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_online_code_closed_form_equals_sequential_fold(seq):
    """The closed-form KT codelength equals the sequential observe-loop
    in ANY order — the order-invariance the wiring-bits term relies on
    (reference MotifModel.java:454-470 runs the loop)."""
    alpha = 0.5
    alphabet = max(seq) + 1
    counts = np.bincount(seq, minlength=alphabet)
    closed = online_multiset_bits(counts, alphabet, alpha)
    for order in (seq, sorted(seq), sorted(seq, reverse=True)):
        seen = [0] * alphabet
        bits = 0.0
        for s in order:
            p = (seen[s] + alpha) / (sum(seen) + alpha * alphabet)
            bits += -math.log2(p)
            seen[s] += 1
        assert math.isclose(bits, closed, rel_tol=1e-9, abs_tol=1e-9)
    assert closed >= 0.0
    assert store_integers_bits(seq) > 0.0


@given(
    n=st.integers(min_value=0, max_value=40),
    data=st.data(),
)
@settings(max_examples=200, deadline=None)
def test_log2_choose_matches_comb(n, data):
    k = data.draw(st.integers(min_value=0, max_value=n))
    assert math.isclose(
        float(log2_choose(k, n)),
        math.log2(math.comb(n, k)) if math.comb(n, k) else 0.0,
        rel_tol=1e-9,
        abs_tol=1e-9,
    )


@pytest.mark.parametrize("salt_chunk", [3, 1000])
@given(data=st.data())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_csr_roundtrip_property(spark, salt_chunk, data):
    """build_csr -> csr_to_edges is the identity on any simple edge set,
    chunks never exceed salt_chunk, and out_deg is the true degree."""
    from motive_spark.graph.csr import build_csr, csr_to_edges

    pairs = data.draw(
        st.sets(
            st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
                lambda t: t[0] != t[1]
            ),
            min_size=1,
            max_size=60,
        )
    )
    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    csr = build_csr(edges, salt_chunk=salt_chunk).cache()
    back = {(r.src, r.dst) for r in csr_to_edges(csr).collect()}
    assert back == pairs
    rows = csr.collect()
    assert all(len(r.dst_list) <= salt_chunk for r in rows)
    deg = {}
    for a, _ in pairs:
        deg[a] = deg.get(a, 0) + 1
    assert all(r.out_deg == deg[r.src] for r in rows)
    csr.unpersist()


def _relabel_pairs(pairs, perm):
    return [(perm[i], perm[j]) for i, j in pairs]


@given(
    k=st.integers(min_value=9, max_value=11),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_refined_canon_permutation_invariant_large_k(k, data):
    """k in 9..11 (I-R canonizer, UT masks): canon is invariant under
    vertex relabeling and idempotent — the shuffled-recanonization
    property the reference asserts for its nauty port
    (MotifModelTest.java:383-391), at the sizes its README documents
    (--maxsize 10, README.md:49-51)."""
    from motive_spark.motifs.canon import _canon_refined

    all_pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    pairs = data.draw(
        st.lists(st.sampled_from(all_pairs), min_size=0, max_size=len(all_pairs))
    )
    perm = data.draw(st.permutations(range(k)))
    mask = edges_to_mask(pairs, k, False)
    c = _canon_refined(mask, k)
    shuffled = edges_to_mask(_relabel_pairs(pairs, list(perm)), k, False)
    assert _canon_refined(shuffled, k) == c
    assert _canon_refined(c, k) == c
    # same edge count (canonization is a relabeling, not a rewrite)
    assert bin(c).count("1") == bin(mask).count("1")


@given(k=st.integers(min_value=9, max_value=11), data=st.data())
@settings(max_examples=60, deadline=None)
def test_ut_mask_roundtrip_large_k(k, data):
    all_pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    pairs = data.draw(st.lists(st.sampled_from(all_pairs), max_size=20))
    m = edges_to_mask(pairs, k, False)
    back = mask_to_edges(m, k, False)
    assert set(back) == set(pairs)
    assert edges_to_mask(back, k, False) == m
    with pytest.raises(ValueError):
        edges_to_mask(pairs, k, True)


@given(k=st.integers(min_value=9, max_value=10), data=st.data())
@settings(max_examples=25, deadline=None)
def test_refined_labeled_canon_invariant_large_k(k, data):
    """Labeled canonization at k in 9..10: relabeling vertices AND
    permuting their labels consistently yields the identical composite
    key (mask + label signature)."""
    from motive_spark.motifs.canon import canonical_labeled_batch

    all_pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    pairs = data.draw(
        st.lists(st.sampled_from(all_pairs), min_size=k - 1, max_size=20)
    )
    labels = data.draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=k, max_size=k)
    )
    perm = list(data.draw(st.permutations(range(k))))
    m1 = edges_to_mask(pairs, k, False)
    cm1, s1 = canonical_labeled_batch(np.array([m1], dtype=np.uint64), [labels], k)
    m2 = edges_to_mask(_relabel_pairs(pairs, perm), k, False)
    labels2 = [""] * k
    for old, new in enumerate(perm):
        labels2[new] = labels[old]
    cm2, s2 = canonical_labeled_batch(np.array([m2], dtype=np.uint64), [labels2], k)
    assert cm1[0] == cm2[0] and s1 == s2


@given(data=st.data(), tol=st.sampled_from([None, 5, 60]))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_pandas_merge_asof(spark, data, tol):
    """asof_join (union-tag window plan) == pandas merge_asof
    (backward, by=key, optional tolerance) on random event sets."""
    import pandas as pd

    from motive_spark.datapipe import asof_join

    def events(n_max, label):
        return data.draw(
            st.lists(
                st.tuples(
                    st.integers(0, 2),              # key
                    st.integers(0, 300),            # seconds offset
                    st.integers(-50, 50),           # payload
                ),
                min_size=1,
                max_size=n_max,
            ),
            label=label,
        )

    lraw = events(15, "left")
    rraw = events(15, "right")
    # dedupe right on (key, ts) — the documented determinism precondition
    rdict = {(k, s): v for k, s, v in rraw}
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in lraw],
            "ts": [base + pd.Timedelta(seconds=s) for _, s, _ in lraw],
            "lv": [v for _, _, v in lraw],
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _ in rdict],
            "ts": [base + pd.Timedelta(seconds=s) for _, s in rdict],
            "rv": list(rdict.values()),
        }
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    got = asof_join(
        left, right, key="k", tolerance_seconds=tol
    ).toPandas()
    want = pd.merge_asof(
        lpdf.sort_values(["ts", "k", "lv"]).reset_index(drop=True),
        rpdf.sort_values("ts").reset_index(drop=True),
        on="ts",
        by="k",
        direction="backward",
        tolerance=None if tol is None else pd.Timedelta(seconds=tol),
    )
    gs = sorted(
        (r.k, r.ts.isoformat(), r.lv,
         None if pd.isna(r.asof_rv) else int(r.asof_rv))
        for r in got.itertuples()
    )
    ws = sorted(
        (r.k, r.ts.isoformat(), r.lv,
         None if pd.isna(r.rv) else int(r.rv))
        for r in want.itertuples()
    )
    assert gs == ws


@given(data=st.data())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_group_percentiles_match_numpy(spark, data):
    """group_percentiles (histogram cumsum, integer ceil-rank) == the
    rank-definition percentile computed per group in numpy: value at
    index ceil(p*n)-1 of the sorted values."""
    import math

    from motive_spark.datapipe import group_percentiles

    rows = data.draw(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(-100, 100)),
            min_size=1,
            max_size=60,
        )
    )
    df = spark.createDataFrame(rows, "g long, v long")
    pcts = [("p25", 1, 4), ("p50", 1, 2), ("p95", 19, 20)]
    got = {
        r.g: (r.n_rows, r.p25, r.p50, r.p95)
        for r in group_percentiles(df, "g", "v", percentiles=pcts).collect()
    }
    groups: dict = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs = sorted(vs)
        n = len(vs)
        want = tuple(
            vs[max(0, math.ceil(num * n / den) - 1)] for _, num, den in pcts
        )
        assert got[g] == (n,) + want, (g, got[g], (n,) + want)


@given(data=st.data())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_approx_percentiles_binned_property(spark, data):
    """The binned sketch reports the lower edge of the bin holding the
    exact rank-percentile: sketch value <= exact value < sketch value +
    bin_width, and the sketch value is a bin lower edge (floored
    multiple of the width) — including for negative values."""
    from motive_spark.datapipe import approx_percentiles_binned

    rows = data.draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(-500, 500)),
            min_size=1,
            max_size=80,
        )
    )
    width = data.draw(st.sampled_from([7, 50, 128]))
    df = spark.createDataFrame(rows, "g long, v long")
    pcts = [("p50", 1, 2), ("p95", 19, 20)]
    got = {
        r.g: (r.n_rows, r.p50, r.p95)
        for r in approx_percentiles_binned(
            df, "g", "v", bin_width=width, percentiles=pcts
        ).collect()
    }
    groups: dict = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs = sorted(vs)
        n = len(vs)
        assert got[g][0] == n
        for (name, num, den), sketch in zip(pcts, got[g][1:]):
            exact = vs[max(0, math.ceil(num * n / den) - 1)]
            # python % floors like the kernel's pmod-based edge
            assert sketch % width == 0, (g, name, sketch, width)
            assert sketch <= exact < sketch + width, (
                g, name, sketch, exact, width,
            )
