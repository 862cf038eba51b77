"""Motif extractor invariants — pytest translations of the reference's
test patterns (SURVEY §5):

* canonical forms unify isomorphic subgraphs (shuffled instance
  re-canonizes to the same motif — MotifModelTest.java:383-391);
* selected occurrences are node-disjoint (testOverlaps,
  UPlainMotifExtractorTest.java:102-120);
* no duplicate nodes within an occurrence (:122-134);
* each occurrence's induced subgraph equals the motif (testMotifs,
  :136-150);
* determinism under a fixed seed (Compare.java:184).
"""

import random
from itertools import permutations

import numpy as np
import pytest

from tests.conftest import edges_df
from tests.test_kernels import FIXTURE_TRI_HUB, random_pairs


def test_canonical_form_invariant_under_permutation():
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    rng = random.Random(7)
    for k in (3, 4, 5):
        for _ in range(20):
            edges = [
                (i, j)
                for i in range(k)
                for j in range(k)
                if i != j and rng.random() < 0.5
            ]
            base = canonical_form(edges_to_mask(edges, k, True), k)
            for p in list(permutations(range(k)))[:10]:
                permuted = [(p[i], p[j]) for i, j in edges]
                assert canonical_form(edges_to_mask(permuted, k, True), k) == base


def test_canonical_form_separates_nonisomorphic():
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    k = 3
    tri = edges_to_mask([(0, 1), (1, 2), (2, 0)], k, False)  # triangle
    path = edges_to_mask([(0, 1), (1, 2)], k, False)  # path
    assert canonical_form(tri, k) != canonical_form(path, k)


def test_canonical_batch_matches_scalar():
    from motive_spark.motifs.canon import canonical_batch

    rng = np.random.default_rng(3)
    k = 4
    masks = rng.integers(0, 2 ** (k * k), size=50, dtype=np.uint64)
    batch = canonical_batch(masks, k)
    from motive_spark.motifs.canon import canonical_form

    for m, c in zip(masks, batch):
        assert canonical_form(int(m), k) == int(c)


@pytest.fixture(scope="module")
def extractor(spark):
    from motive_spark.motifs import MotifExtractor

    pairs = random_pairs(60, 240, seed=5, directed=False)
    edges = edges_df(spark, pairs)
    return (
        MotifExtractor(
            edges, samples=800, min_size=3, max_size=5, min_freq=2,
            seed=42, directed=False,
        ),
        dict(pairs=pairs),
    )


def test_occurrences_connected_and_induced(extractor):
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    ex, ctx = extractor
    adj = {}
    for a, b in ctx["pairs"]:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = ex.occurrences().collect()
    assert rows
    for r in rows:
        vs = list(r.vertices)
        assert len(vs) == len(set(vs))  # no dup nodes in an occurrence
        # connected (BFS over induced subgraph)
        seen = {vs[0]}
        stack = [vs[0]]
        vset = set(vs)
        while stack:
            u = stack.pop()
            for w in adj.get(u, ()) & vset:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        assert seen == vset
        # induced subgraph canonizes to the motif key
        k = r.k
        local = {v: i for i, v in enumerate(vs)}
        ind = [
            (local[a], local[b])
            for a in vs
            for b in adj.get(a, ())
            if b in vset and local[a] < local[b]
        ]
        assert canonical_form(edges_to_mask(ind, k, False), k) == r.canon


def test_selected_occurrences_node_disjoint_per_motif(extractor):
    ex, _ = extractor
    rows = ex.occurrences().collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canon, []).extend(r.vertices)
    for canon, verts in by_canon.items():
        assert len(verts) == len(set(verts)), f"overlap within motif {canon}"


def test_extractor_deterministic(spark):
    from motive_spark.motifs import MotifExtractor

    pairs = random_pairs(40, 150, seed=9, directed=False)
    edges = edges_df(spark, pairs)
    a = MotifExtractor(edges, samples=300, min_size=3, max_size=4, directed=False)
    b = MotifExtractor(edges, samples=300, min_size=3, max_size=4, directed=False)
    fa = {(r.canon, r.freq) for r in a.motifs().collect()}
    fb = {(r.canon, r.freq) for r in b.motifs().collect()}
    assert fa == fb


def test_triangle_motif_found_in_fixture(spark):
    from motive_spark.motifs import MotifExtractor
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    edges = edges_df(spark, FIXTURE_TRI_HUB)
    ex = MotifExtractor(
        edges, samples=400, min_size=3, max_size=3, min_freq=2, directed=False
    )
    tri_canon = canonical_form(edges_to_mask([(0, 1), (1, 2), (0, 2)], 3, False), 3)
    freqs = {r.canon: r.freq for r in ex.motifs().collect()}
    assert tri_canon in freqs  # the planted triangles surface


def test_directed_extractor_and_injection(spark):
    """Directed pipeline end-to-end: plant a feed-forward-loop motif in a
    directed ER graph; the extractor + scorer must recover it (the
    reference's fast path is directed-only, Run.java:223-224)."""
    from motive_spark.mdl.score import score_motifs
    from motive_spark.motifs import MotifExtractor
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    ffl = [(0, 1), (1, 2), (0, 2)]  # feed-forward loop
    target = canonical_form(edges_to_mask(ffl, 3, True), 3)
    pairs = set(random_pairs(100, 200, seed=23, directed=True))
    for i in range(15):
        vs = [100 + 3 * i + j for j in range(3)]
        for a, b in ffl:
            pairs.add((vs[a], vs[b]))
        pairs.add((i, vs[0]))
    edges = edges_df(spark, sorted(pairs))
    ex = MotifExtractor(
        edges, samples=2000, min_size=3, max_size=3, min_freq=2, directed=True
    )
    freqs = {r.canon: r.freq for r in ex.motifs().collect()}
    assert target in freqs
    # occurrences of the FFL really induce an FFL
    import itertools

    eset = set(pairs)
    for r in ex.occurrences(target).collect():
        vs = list(r.vertices)
        local = {v: i for i, v in enumerate(vs)}
        ind = [
            (local[a], local[b])
            for a, b in itertools.permutations(vs, 2)
            if (a, b) in eset
        ]
        assert canonical_form(edges_to_mask(ind, 3, True), 3) == target
    scores = {
        r.canon: r for r in score_motifs(edges, ex.occurrences(), directed=True).collect()
    }
    assert target in scores
    best = max(scores.values(), key=lambda r: r.factor_er)
    assert best.canon == target and best.factor_er > 0


def test_canonical_labeled_invariants():
    """Labeled canonization: label-preserving isomorphisms unify, label
    pattern differences split (DPlainMotifExtractor.java:54-63)."""
    from motive_spark.motifs.canon import canonical_labeled, edges_to_mask

    # path 0-1-2 (center 1), undirected
    path = edges_to_mask([(0, 1), (1, 2)], 3, False)
    # same labeled graph under a vertex relabeling: center keeps label B
    a = canonical_labeled(path, ["A", "B", "A"], 3)
    perm_mask = edges_to_mask([(2, 1), (1, 0)], 3, False)  # same structure
    b = canonical_labeled(perm_mask, ["A", "B", "A"], 3)
    assert a == b
    # endpoints swapped with distinct labels: still isomorphic as labeled
    c1 = canonical_labeled(path, ["A", "B", "C"], 3)
    c2 = canonical_labeled(path, ["C", "B", "A"], 3)
    assert c1 == c2
    # center label differs -> different labeled motif, same structure
    d = canonical_labeled(path, ["B", "A", "B"], 3)
    assert d != a and d[0] == a[0]
    # triangle: all rotations unify
    tri = edges_to_mask([(0, 1), (1, 2), (0, 2)], 3, False)
    t1 = canonical_labeled(tri, ["X", "Y", "Z"], 3)
    t2 = canonical_labeled(tri, ["Y", "Z", "X"], 3)
    assert t1 == t2


def test_extractor_label_sensitive(spark):
    """Two structurally-identical triangle populations with different
    label patterns split into separate motifs when labels are given and
    unify when not."""
    from motive_spark.motifs import MotifExtractor

    pairs, labels = [], []
    for i in range(8):
        vs = [3 * i, 3 * i + 1, 3 * i + 2]
        pairs += [(vs[0], vs[1]), (vs[1], vs[2]), (vs[0], vs[2])]
        pat = ["red", "red", "blue"] if i % 2 == 0 else ["green", "green", "green"]
        labels += list(zip(vs, pat))
    # connect the triangles in a ring so sampling can reach all of them
    for i in range(8):
        pairs.append((3 * i, 3 * ((i + 1) % 8)))
    e = spark.createDataFrame(sorted(set(pairs)), "src long, dst long")
    lab = spark.createDataFrame(labels, "id long, label string")

    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    tri_canon = canonical_form(edges_to_mask([(0, 1), (1, 2), (0, 2)], 3, False), 3)
    blind = MotifExtractor(e, samples=500, min_size=3, max_size=3,
                           min_freq=1, directed=False)
    # structure-blind extraction UNIFIES both label populations into one
    # triangle motif class
    tri_blind = [r for r in blind.motifs().collect() if r["canon"] == tri_canon]
    assert len(tri_blind) == 1 and tri_blind[0]["freq"] >= 6
    labeled = MotifExtractor(e, samples=500, min_size=3, max_size=3,
                             min_freq=1, directed=False, vertex_labels=lab)
    sigs = {
        r["canon_key"]
        for r in labeled.motifs().collect()
        if r["canon_key"].count("\x1f") == 2 and r["freq"] >= 2
    }
    # the two triangle label patterns appear as DISTINCT labeled motifs
    tri_sigs = {s for s in sigs if "green" in s or "red" in s}
    assert any("green" in s for s in tri_sigs)
    assert any("red" in s and "blue" in s for s in tri_sigs)
    # occurrences carry labels aligned to vertex order
    occ = labeled.occurrences().limit(5).collect()
    for r in occ:
        assert len(r["labels"]) == r["k"]


def test_sampler_seed_plan_no_single_partition_exchange(spark):
    """The seed-vertex setup must not sort |V| through one task nor force
    a |V|-row broadcast (VERDICT r2 #1): the dense index comes from
    two-phase per-partition offsets and the samples->vertex map is a
    plain equi-join."""
    from motive_spark.motifs.sample import seed_states

    pairs = random_pairs(300, 1500, seed=21)
    edges = edges_df(spark, pairs)
    verts = (
        edges.selectExpr("src as v")
        .union(edges.selectExpr("dst as v"))
        .distinct()
    )
    n = verts.count()
    state = seed_states(verts, n, 200, 3, 5, seed=7)
    plan = state._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    # seeds are valid vertices, one row per surviving sample, k in range
    rows = state.collect()
    assert len(rows) == 200
    vs = {r.v for r in verts.collect()}
    for r in rows:
        assert len(r.vertices) == 1 and r.vertices[0] in vs
        assert 3 <= r.k <= 5


def test_extractor_maxsize_10(spark):
    """The README's own envelope (--maxsize 10, README.md:49-51): an
    undirected extraction with k up to 10 samples, canonizes (I-R path
    for k >= 9, UT masks), counts, and selects — and every occurrence's
    induced subgraph recanonizes to its motif key."""
    from motive_spark.motifs import MotifExtractor
    from motive_spark.motifs.canon import canonical_form, edges_to_mask

    pairs = random_pairs(80, 400, seed=9, directed=False)
    edges = edges_df(spark, pairs)
    ex = MotifExtractor(
        edges, samples=400, min_size=8, max_size=10, min_freq=1,
        seed=7, directed=False,
    )
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = ex.occurrences().collect()
    assert rows and any(r.k >= 9 for r in rows)
    for r in rows:
        vs = list(r.vertices)
        vset = set(vs)
        local = {v: i for i, v in enumerate(vs)}
        ind = [
            (local[a], local[b])
            for a in vs
            for b in adj.get(a, ())
            if b in vset and local[a] < local[b]
        ]
        assert canonical_form(edges_to_mask(ind, r.k, False), r.k) == r.canon


def test_extractor_directed_above_8_rejected(spark):
    from motive_spark.motifs import MotifExtractor

    edges = edges_df(spark, [(0, 1), (1, 2)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="directed"):
        MotifExtractor(edges, samples=10, max_size=9, directed=True)
