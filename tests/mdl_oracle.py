"""Naive reference implementation of the MDL motif score (test oracle).

Builds the contracted graph explicitly (the reference's subbedGraph,
MotifModel.java:989-1174) with plain dicts, computes every codelength
term directly, and shares the code primitives with the engine
(motive_spark.mdl.codes/models) — the "slow but obviously correct"
side of the fast-vs-slow equivalence pattern that dominates the
reference's own test suite (MotifModelTest.java:133-145, 643-665).
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from motive_spark.mdl import codes
from motive_spark.mdl.models import el_bits_directed, el_bits_undirected, er_bits


def naive_score(
    pairs: list[tuple[int, int]],
    occurrences: list[list[int]],
    motif_edges: list[tuple[int, int]],
    k: int,
    directed: bool,
    reset_wiring: bool = True,
    mult: dict | None = None,
) -> dict:
    """Full naive contraction + codelengths.

    ``pairs``: the graph's simple edges (directed as given, or arbitrary
    orientation if undirected).  ``occurrences``: node-disjoint vertex
    lists (sorted).  ``motif_edges``: local 0-based motif edge list.
    ``mult``: optional multigraph multiplicity per simple pair (the
    non-simplified path, MotifModel.java:109-133: every raw duplicate
    contributes its own wiring anchors and removal counts).
    """
    if directed:
        edges = sorted({(a, b) for a, b in pairs if a != b})
    else:
        edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    mult = dict(mult or {})
    wt = {e: int(mult.get(e, 1)) for e in edges}
    verts = sorted({x for e in edges for x in e})
    n, m = len(verts), len(edges)

    member = {}
    rep = {}
    pos = {}
    for oi, occ in enumerate(occurrences):
        for p, v in enumerate(occ):
            member[v] = oi
            rep[v] = occ[0]
            pos[v] = p

    # explicit contraction (each raw duplicate rewired independently)
    pair_mult: Counter = Counter()
    wiring = [[] for _ in occurrences]
    for a, b in edges:
        ain, bin_ = a in member, b in member
        if ain and bin_ and member[a] == member[b]:
            continue  # intra-instance: disappears
        na = rep[a] if ain else a
        nb = rep[b] if bin_ else b
        if not directed:
            na, nb = min(na, nb), max(na, nb)
        pair_mult[(na, nb)] += wt[(a, b)]
        if ain:
            wiring[member[a]].extend([pos[a]] * wt[(a, b)])
        if bin_:
            wiring[member[b]].extend([pos[b]] * wt[(a, b)])
    simple_sub = sorted(pair_mult)
    n_sub = n - sum(len(o) - 1 for o in occurrences)
    m_sub_graph = len(simple_sub)

    # subbed degree histogram over n_sub vertices
    sub_verts = set()
    for v in verts:
        if v not in member or rep.get(v) == v:
            sub_verts.add(v)
    degc: Counter = Counter()
    if directed:
        ind: Counter = Counter()
        outd: Counter = Counter()
        for a, b in simple_sub:
            outd[a] += 1
            ind[b] += 1
        hist_in = Counter(ind[v] for v in sub_verts)
        hist_out = Counter(outd[v] for v in sub_verts)
        joint = Counter((ind[v], outd[v]) for v in sub_verts)
    else:
        for a, b in simple_sub:
            degc[a] += 1
            degc[b] += 1
        hist_u = Counter(degc[v] for v in sub_verts)
    assert len(sub_verts) == n_sub, (len(sub_verts), n_sub)

    # --- terms ---
    if reset_wiring:
        wiring_bits = sum(
            codes.online_multiset_bits(np.bincount(w, minlength=k), k)
            for w in wiring
            if True
        )
    else:
        allw = [x for w in wiring for x in w]
        wiring_bits = codes.online_multiset_bits(np.bincount(allw, minlength=k), k)

    # every simple subbed pair incident to a rep node gets an entry
    reps = {o[0] for o in occurrences}
    additions = [pair_mult[p] - 1 for p in simple_sub if p[0] in reps or p[1] in reps]
    multi_bits = codes.store_integers_bits(additions)

    n_occ = len(occurrences)
    labels = float(codes.prefix_bits(n_occ) + codes.log2_choose(n_occ, n_sub))
    insertions = float(codes.log2_factorial(n) - codes.log2_factorial(n_sub))

    m_motif = len(motif_edges)
    if directed:
        sub_er = float(er_bits(k, m_motif, directed=True))
        subbed_er = float(er_bits(n_sub, m_sub_graph, directed=True))
        mi = Counter(sum(1 for x, y in motif_edges if y == i) for i in range(k))
        mo = Counter(sum(1 for x, y in motif_edges if x == i) for i in range(k))
        sub_el = el_bits_directed(mi, mo, m_motif)
        subbed_el = el_bits_directed(hist_in, hist_out, m_sub_graph)
        base_ind = Counter()
        base_outd = Counter()
        for a, b in edges:
            base_outd[a] += 1
            base_ind[b] += 1
        base_el = el_bits_directed(
            Counter(base_ind[v] for v in verts),
            Counter(base_outd[v] for v in verts),
            m,
        )
        base_er = float(er_bits(n, m, directed=True))
    else:
        sub_er = float(er_bits(k, m_motif, directed=False))
        subbed_er = float(er_bits(n_sub, m_sub_graph, directed=False))
        mh = Counter(
            sum(1 for x, y in motif_edges if x == i or y == i) for i in range(k)
        )
        sub_el = el_bits_undirected(mh, m_motif)
        subbed_el = el_bits_undirected(hist_u, m_sub_graph)
        bd = Counter()
        for a, b in edges:
            bd[a] += 1
            bd[b] += 1
        base_el = el_bits_undirected(Counter(bd[v] for v in verts), m)
        base_er = float(er_bits(n, m, directed=False))

    common = wiring_bits + labels + insertions + multi_bits
    return {
        "size_er": sub_er + subbed_er + common,
        "size_el": sub_el + subbed_el + common,
        "factor_er": base_er - (sub_er + subbed_er + common),
        "factor_el": base_el - (sub_el + subbed_el + common),
        "n_sub": n_sub,
        "m_sub": m_sub_graph,
        "wiring": wiring_bits,
        "multi": multi_bits,
        "common": float(common),
        # subbed degree histogram for the Beta/DS consumer: joint (in,
        # out) pairs when directed, plain degrees otherwise
        "subbed_hist": dict(joint) if directed else dict(hist_u),
    }
