"""Canonical forms for k-node subgraphs (k <= 11).

Replaces the reference's (partial) Nauty re-implementation
(Nauty.order at UPlainMotifExtractor.java:151-154; README.md:118 flags
it as the sampling bottleneck at ~417 samples/s for 10-node motifs).
Isomorphic subgraphs must map to identical keys so a plain groupBy
unifies them (SURVEY §2.3 J5).

Two regimes, split at k = 8 (= MAX_BRUTE_K):

* **k <= 8** — the key is the minimum k*k-bit adjacency mask over ALL
  k! vertex permutations, fully vectorized: for each k the permutation
  bit-gather table is precomputed once (k! x k^2 source-bit indices)
  and a batch of B masks is canonized with k^2 numpy ops per
  permutation — no per-row Python in the hot loop.  Directed and
  undirected share the representation (bit i*k+j = edge i→j;
  undirected masks are symmetric).

* **9 <= k <= 11, undirected** — k! brute force is infeasible (3.6M
  permutations at k=10) and k*k bits overflow a 64-bit mask, so large
  masks switch to **upper-triangle packing** (bit ut(i,j) for i<j;
  C(11,2) = 55 bits, still a LongType column) and canonization runs an
  **individualization-refinement search** (the same family of pruning
  as nauty, SURVEY §7.3-1): equitable-partition refinement by iterated
  neighbor-count signatures, branch on the first non-singleton cell,
  prune branches whose partially-determined adjacency already exceeds
  the best leaf (staircase bound) and branches that only differ from a
  tried sibling by a twin swap (an explicit automorphism).  The
  canonical key is the UT mask of the minimum-staircase leaf matrix —
  a complete isomorphism invariant because every search decision
  depends only on isomorphism-invariant data.  Directed graphs above
  k = 8 would need 2 bits per pair (> 64 at k = 10) and are rejected,
  matching the reference's practical envelope (plain-graph nauty;
  README.md:118).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import permutations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_BRUTE_K = 8
MAX_K = 11


@lru_cache(maxsize=MAX_BRUTE_K + 1)
def _perm_tables(k: int) -> np.ndarray:
    """(k!, k*k) int8 table: row p, column (i*k+j) holds the SOURCE bit
    position (p[i]*k + p[j]) whose value lands at (i*k+j) under p."""
    perms = list(permutations(range(k)))
    table = np.empty((len(perms), k * k), dtype=np.int64)
    for r, p in enumerate(perms):
        for i in range(k):
            for j in range(k):
                table[r, i * k + j] = p[i] * k + p[j]
    return table


def canonical_form(mask: int, k: int) -> int:
    """Canonical (minimum) bitmask of a single k-node subgraph."""
    return int(canonical_batch(np.array([mask], dtype=np.uint64), k)[0])


def canonical_batch(masks: np.ndarray, k: int) -> np.ndarray:
    """Vectorized canonization of a batch of k-node adjacency bitmasks.

    k <= 8: full-permutation minimum over the k*k-bit masks.  k in
    9..11 (undirected UT-packed masks): refinement search per UNIQUE
    mask — sampled motif batches repeat heavily, so the np.unique
    dedup + lru-cached search amortizes to a dict lookup per row.
    """
    if k > MAX_K:
        raise ValueError(f"k={k} exceeds MAX_K={MAX_K}")
    if k > MAX_BRUTE_K:
        uniq, inv = np.unique(masks.astype(np.uint64), return_inverse=True)
        out = np.fromiter(
            (_canon_refined(int(m), k) for m in uniq),
            dtype=np.uint64,
            count=len(uniq),
        )
        return out[inv]
    masks = masks.astype(np.uint64)
    nbits = k * k
    # bits[b, row] = bit b of mask row
    bits = (masks[None, :] >> np.arange(nbits, dtype=np.uint64)[:, None]) & np.uint64(1)
    table = _perm_tables(k)
    best = None
    for perm_row in table:
        # gather: permuted bit at position t comes from source bit perm_row[t]
        permuted_bits = bits[perm_row, :]  # (nbits, B)
        weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))[:, None]
        cand = (permuted_bits * weights).sum(axis=0, dtype=np.uint64)
        best = cand if best is None else np.minimum(best, cand)
    return best


def _ut_index(i: int, j: int, k: int) -> int:
    """Row-major upper-triangle bit position of pair (i, j), i < j."""
    return i * (2 * k - i - 1) // 2 + (j - i - 1)


def edges_to_mask(edge_pairs, k: int, directed: bool) -> int:
    """Local edge list [(i, j), ...] (0-based, i != j) → adjacency
    bitmask: k*k-bit row-major for k <= 8, UT-packed for k in 9..11
    (undirected only)."""
    m = 0
    if k <= MAX_BRUTE_K:
        for i, j in edge_pairs:
            m |= 1 << (i * k + j)
            if not directed:
                m |= 1 << (j * k + i)
        return m
    if directed:
        raise ValueError(f"directed motifs cap at k={MAX_BRUTE_K}")
    if k > MAX_K:
        raise ValueError(f"k={k} exceeds MAX_K={MAX_K}")
    for i, j in edge_pairs:
        if i > j:
            i, j = j, i
        m |= 1 << _ut_index(i, j, k)
    return m


def mask_to_edges(mask: int, k: int, directed: bool) -> list[tuple[int, int]]:
    """Inverse of edges_to_mask (canonical masks → motif.NNN.edgelist sink)."""
    out = []
    if k <= MAX_BRUTE_K:
        for i in range(k):
            for j in range(k):
                if mask >> (i * k + j) & 1:
                    if directed or i < j:
                        out.append((i, j))
        return out
    if directed:
        raise ValueError(f"directed motifs cap at k={MAX_BRUTE_K}")
    for i in range(k):
        for j in range(i + 1, k):
            if mask >> _ut_index(i, j, k) & 1:
                out.append((i, j))
    return out


# --- refinement canonizer for 9 <= k <= 11 (undirected, UT masks) ----------


def _refine(adj: np.ndarray, cells: list[list[int]]) -> list[list[int]]:
    """Equitable-partition refinement: split cells by the vector of
    neighbor counts into every cell, until stable.  Split order (first
    splittable cell; sub-cells ordered by sorted signature) depends
    only on isomorphism-invariant data."""
    while True:
        for ci, cell in enumerate(cells):
            if len(cell) == 1:
                continue
            sigs: dict[tuple[int, ...], list[int]] = {}
            for v in cell:
                s = tuple(int(adj[v, c].sum()) for c in cells)
                sigs.setdefault(s, []).append(v)
            if len(sigs) > 1:
                cells = (
                    cells[:ci]
                    + [sigs[s] for s in sorted(sigs)]
                    + cells[ci + 1 :]
                )
                break
        else:
            return cells


def _is_twin(adj: np.ndarray, u: int, v: int) -> bool:
    """True iff swapping u and v (fixing everything else) is an
    automorphism — identical rows off the pair itself."""
    w = np.ones(adj.shape[0], dtype=bool)
    w[u] = w[v] = False
    return bool(np.array_equal(adj[u, w], adj[v, w]))


def _ir_search(mask: int, k: int, collect_ties: bool):
    """Individualization-refinement search over the UT-packed mask.

    Returns (stair, perms): the minimum staircase bit tuple (bits
    (s,t) for t in 1..k-1, s < t — every bit determined as soon as its
    two endpoints are placed, so partial assignments prune exactly) and
    the leaf permutations achieving it (all of them when collect_ties —
    the automorphism coset for labeled canonization — else one)."""
    adj = np.zeros((k, k), dtype=np.int8)
    for i in range(k):
        for j in range(i + 1, k):
            if mask >> _ut_index(i, j, k) & 1:
                adj[i, j] = adj[j, i] = 1
    best: dict = {"stair": None, "perms": []}

    def search(cells: list[list[int]]) -> None:
        cells = _refine(adj, cells)
        placed: list[int] = []
        for cell in cells:
            if len(cell) != 1:
                break
            placed.append(cell[0])
        pre = tuple(
            int(adj[placed[s], placed[t]])
            for t in range(len(placed))
            for s in range(t)
        )
        if best["stair"] is not None and pre > best["stair"][: len(pre)]:
            return
        if len(placed) == k:
            if best["stair"] is None or pre < best["stair"]:
                best["stair"] = pre
                best["perms"] = [placed]
            elif pre == best["stair"] and collect_ties:
                best["perms"].append(placed)
            return
        ti = next(i for i, c in enumerate(cells) if len(c) > 1)
        target = cells[ti]
        tried: list[int] = []
        for v in sorted(target):
            if not collect_ties and any(_is_twin(adj, u, v) for u in tried):
                continue
            tried.append(v)
            rest = [u for u in target if u != v]
            search(cells[:ti] + [[v], rest] + cells[ti + 1 :])

    search([list(range(k))])
    return best["stair"], best["perms"]


def _perm_ut_mask(mask: int, k: int, perm: list[int]) -> int:
    """UT mask of the relabeled graph: position i holds original vertex
    perm[i]."""
    src = np.zeros((k, k), dtype=np.int8)
    for i in range(k):
        for j in range(i + 1, k):
            if mask >> _ut_index(i, j, k) & 1:
                src[i, j] = src[j, i] = 1
    out = 0
    for i in range(k):
        for j in range(i + 1, k):
            if src[perm[i], perm[j]]:
                out |= 1 << _ut_index(i, j, k)
    return out


@lru_cache(maxsize=1 << 18)
def _canon_refined(mask: int, k: int) -> int:
    """Canonical UT mask of one large-k undirected subgraph."""
    _, perms = _ir_search(mask, k, collect_ties=False)
    return _perm_ut_mask(mask, k, perms[0])


@lru_cache(maxsize=1 << 16)
def _canon_refined_coset(mask: int, k: int) -> tuple[int, tuple[tuple[int, ...], ...]]:
    """(canonical UT mask, all minimum-staircase leaf permutations) —
    the tie leaves are the canonical matrix's automorphism coset (the
    I-R tree without twin pruning is closed under automorphisms), so
    the labeled canonizer minimizes label sequences over exactly the
    same coset the brute-force path enumerates for k <= 8."""
    _, perms = _ir_search(mask, k, collect_ties=True)
    return _perm_ut_mask(mask, k, perms[0]), tuple(tuple(p) for p in perms)


@F.pandas_udf(T.StringType())
def canonical_labeled_udf(
    mask: pd.Series, k: pd.Series, labels: pd.Series
) -> pd.Series:
    """Arrow-batched labeled canonization: (mask, k, labels array) →
    'canonMask:label-signature' composite key string."""
    mk = mask.to_numpy(dtype=np.int64)
    kk = k.to_numpy(dtype=np.int64)
    out = [""] * len(mk)
    idx = np.arange(len(mk))
    for kv in np.unique(kk):
        sel = idx[kk == kv]
        labs = [list(labels.iloc[i]) for i in sel]
        cm, sigs = canonical_labeled_batch(
            mk[sel].astype(np.uint64), labs, int(kv)
        )
        for j, i in enumerate(sel):
            out[i] = f"{int(cm[j])}:{sigs[j]}"
    return pd.Series(out)


@F.pandas_udf(T.LongType())
def canonical_udf(mask: pd.Series, k: pd.Series) -> pd.Series:
    """Arrow-batched canonization: (mask, k) → canonical mask."""
    out = np.empty(len(mask), dtype=np.int64)
    mk = mask.to_numpy(dtype=np.int64)
    kk = k.to_numpy(dtype=np.int64)
    for kv in np.unique(kk):
        sel = kk == kv
        out[sel] = canonical_batch(mk[sel].astype(np.uint64), int(kv)).astype(np.int64)
    return pd.Series(out)


# --- label-sensitive canonization (DPlainMotifExtractor.java:54-63) --------


def canonical_labeled(mask: int, labels: list[str], k: int) -> tuple[int, str]:
    """Canonical form of a LABELED k-node subgraph: the permutation
    minimizing (adjacency mask, label sequence) lexicographically.

    Returns (canon_mask, canon_label_sig) where the signature is the
    label sequence under the winning permutation joined with '\\x1f'.
    Two labeled subgraphs are isomorphic WITH matching labels iff both
    components are equal — the reference matches labels unless blanked
    (DPlainMotifExtractor.java:54-63, Graphs.blank).
    """
    masks, sigs = canonical_labeled_batch(
        np.array([mask], dtype=np.uint64), [list(labels)], k
    )
    return int(masks[0]), sigs[0]


def canonical_labeled_batch(masks: np.ndarray, labels: list[list[str]], k: int):
    """Batch labeled canonization.

    Phase 1 (vectorized, same as canonical_batch): minimum mask over all
    permutations, remembering WHICH permutations achieve it.  Phase 2
    (per row, over the few mask-minimizing permutations — the canonical
    mask's automorphism coset, usually tiny): lexicographically minimal
    permuted label sequence.
    """
    if k > MAX_K:
        raise ValueError(f"k={k} exceeds MAX_K={MAX_K}")
    if k > MAX_BRUTE_K:
        out_masks = np.empty(len(masks), dtype=np.uint64)
        sigs = []
        for b, m in enumerate(masks):
            cm, coset = _canon_refined_coset(int(m), k)
            out_masks[b] = cm
            lab = labels[b]
            best_seq = min(tuple(lab[p[i]] for i in range(k)) for p in coset)
            sigs.append("\x1f".join(best_seq))
        return out_masks, sigs
    masks = masks.astype(np.uint64)
    nbits = k * k
    bits = (masks[None, :] >> np.arange(nbits, dtype=np.uint64)[:, None]) & np.uint64(1)
    table = _perm_tables(k)
    perms = list(permutations(range(k)))
    weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))[:, None]
    # running minimum + per-row achiever lists — O(B + total achievers)
    # memory, NOT the k! x B candidate matrix (3+ GB per Arrow batch at
    # k=8); achiever lists stay tiny (the canonical mask's automorphisms)
    best = None
    achievers: list[list[int]] = [[] for _ in range(len(masks))]
    for r, perm_row in enumerate(table):
        cand = (bits[perm_row, :] * weights).sum(axis=0, dtype=np.uint64)
        if best is None:
            best = cand.copy()
            for i in range(len(masks)):
                achievers[i].append(r)
            continue
        lt = cand < best
        eq = cand == best
        np.minimum(best, cand, out=best)
        for i in np.flatnonzero(lt):
            achievers[i] = [r]
        for i in np.flatnonzero(eq):
            achievers[i].append(r)
    sigs = []
    for b in range(len(masks)):
        lab = labels[b]
        best_seq = None
        for r in achievers[b]:
            p = perms[r]
            # position i of the canonical graph holds original vertex p[i]
            seq = tuple(lab[p[i]] for i in range(k))
            if best_seq is None or seq < best_seq:
                best_seq = seq
        sigs.append("\x1f".join(best_seq))
    return best, sigs
