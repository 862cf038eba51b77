"""Beta / degree-sequence (DS) null model via importance sampling (A13).

The reference's third null model (DegreeSequenceModel, "beta" —
Compare.java:263, MotifModel.java:161-208): the graph is coded uniformly
among all simple graphs with its exact degree sequence; the count of
such graphs is estimated by sequential importance sampling and turned
into a conservative codelength through a log-normal confidence upper
bound (LogNormalCI.upperBound(alpha), MotifModel.java:207).

Sampler: Blitzstein–Diaconis sequential importance sampling for graphs
with prescribed degrees (public literature: Blitzstein & Diaconis 2011,
Internet Mathematics).  Each sample builds a graph edge-by-edge from the
minimum-residual-degree vertex, tracking the proposal probability q(Y)
and the permutation factor c(Y); 1/(c(Y) q(Y)) is an unbiased estimate
of the number of graphs.  The estimator's correctness is pinned by an
exact-enumeration test on small sequences (tests/test_beta.py), the
same contract as the reference's 50-bit MC tolerance tests
(MotifModelTest.java:66-97).

Spark shape: iterations are embarrassingly parallel — ``spark.range(
iterations).mapInPandas`` fans each seeded sample to a Python worker
(MotifModel's DS-sampling executor pool, Compare.java:179-183, become
Spark tasks).  ``size_beta`` scores motifs under the model both
undirected (MotifModel.java:310-357) and directed (MotifModel.java:
161-208, via the Fulkerson–Chen–Anstee-guarded sampler and the JOINT
(in, out) degree-pair histogram); the structural terms come from the
scale-out ``score_motifs_with_hists`` pass.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from motive_spark.mdl import codes
from motive_spark.mdl.models import _degree_hist_entropy_bits

_LN2 = math.log(2.0)


def _is_graphical(res: np.ndarray) -> bool:
    """Erdős–Gallai check for a residual degree sequence."""
    d = np.sort(res)[::-1]
    if d.sum() % 2 or (d < 0).any():
        return False
    n = len(d)
    csum = np.cumsum(d)
    for r in range(1, n + 1):
        rhs = r * (r - 1) + np.sum(np.minimum(d[r:], r))
        if csum[r - 1] > rhs:
            return False
    return True


def bd_sample_log_count(deg_seq: list[int], rng: np.random.Generator) -> float:
    """One Blitzstein–Diaconis sample → ln(1 / (c(Y) q(Y))), an unbiased
    (in linear space) estimate of ln #graphs with this degree sequence."""
    res = np.asarray(deg_seq, dtype=np.int64).copy()
    n = len(res)
    adj: set[tuple[int, int]] = set()
    log_q = 0.0
    log_c = 0.0
    if not _is_graphical(res):
        raise ValueError(f"non-graphical degree sequence: {deg_seq}")
    while res.sum() > 0:
        pos = np.where(res > 0)[0]
        i = pos[np.argmin(res[pos])]  # minimal positive residual vertex
        log_c += math.lgamma(res[i] + 1.0)  # c(Y) *= a_i!
        while res[i] > 0:
            cand = []
            weights = []
            for j in range(n):
                if j == i or res[j] <= 0:
                    continue
                e = (min(i, j), max(i, j))
                if e in adj:
                    continue
                # feasibility: adding (i, j) must keep the rest graphical
                res[i] -= 1
                res[j] -= 1
                ok = _is_graphical(res)
                res[i] += 1
                res[j] += 1
                if ok:
                    cand.append(j)
                    weights.append(res[j])
            w = np.asarray(weights, dtype=np.float64)
            p = w / w.sum()
            j = cand[rng.choice(len(cand), p=p)]
            log_q += math.log(p[cand.index(j)])
            adj.add((min(i, j), max(i, j)))
            res[i] -= 1
            res[j] -= 1
    return -(log_c + log_q)


def _fanout_ln_samples(
    spark: SparkSession | None,
    sample_fns: list,
    iterations: int,
    seed: int,
) -> list[np.ndarray]:
    """Shared MC fan-out: ``sample_fns[h]`` maps an rng to one ln-count
    sample for histogram h.  ALL histograms' iterations run in ONE Spark
    job (row id = h * iterations + iter) — the per-call scaffolding is
    single-sourced and a scoring round with 100 pending (motif, cutoff)
    points pays one job, not 100 serialized ones.  The rng stream is
    (seed, iter), identical to a per-histogram call, so results are
    independent of the batching."""
    n = len(sample_fns)
    if n == 0:
        return []
    if spark is None or n * iterations <= 8:
        return [
            np.array(
                [fn(np.random.default_rng((seed, i))) for i in range(iterations)]
            )
            for fn in sample_fns
        ]

    def run(batches):
        for pdf in batches:
            hs, vals = [], []
            for rid in pdf["id"]:
                h, it = divmod(int(rid), iterations)
                rng = np.random.default_rng((seed, int(it)))
                hs.append(h)
                vals.append(sample_fns[h](rng))
            yield pd.DataFrame({"h": hs, "ln_count": vals})

    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(n * iterations).repartition(min(n * iterations, npart))
    rows = df.mapInPandas(run, schema="h long, ln_count double").collect()
    out: list[list[float]] = [[] for _ in range(n)]
    for r in rows:
        out[r.h].append(r.ln_count)
    return [np.array(v) for v in out]


def bd_log_count_samples(
    spark: SparkSession | None,
    deg_seq: list[int],
    iterations: int = 50,
    seed: int = 42,
) -> np.ndarray:
    """``iterations`` independent ln-count estimates; Spark fan-out when a
    session is given (one seeded sample per task), else a local loop."""
    seq = [int(d) for d in deg_seq if d > 0] + [int(d) for d in deg_seq if d == 0]
    return _fanout_ln_samples(
        spark, [lambda rng: bd_sample_log_count(seq, rng)], iterations, seed
    )[0]


def lognormal_upper(ln_samples: np.ndarray, alpha: float = 0.05) -> float:
    """Upper confidence bound (Cox's method) for ln E[W] assuming the
    importance weights W are log-normal — mirrors LogNormalCI.upperBound
    (MotifModel.java:207), conservative by design."""
    from math import sqrt

    s = np.asarray(ln_samples, dtype=np.float64)
    nn = len(s)
    mu = s.mean()
    var = s.var(ddof=1) if nn > 1 else 0.0
    z = 1.6448536269514722 if alpha == 0.05 else _z_quantile(1 - alpha)
    half = z * sqrt(var / nn + var * var / (2.0 * (nn - 1))) if nn > 1 else 0.0
    return mu + var / 2.0 + half


def _z_quantile(p: float) -> float:
    """Standard normal quantile (Acklam's rational approximation)."""
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow = 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p <= 1 - plow:
        q = p - 0.5
        r = q * q
        return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
            ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
        )
    q = math.sqrt(-2 * math.log(1 - p))
    return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
        (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
    )


def _expand_directed(items):
    """(in,out)-histogram items → (out_seq, in_seq), worker-side.

    Same expansion order as iterating the sorted joint histogram, so the
    BD sampler sees the identical sequence the old driver-side expansion
    produced."""
    in_seq: list[int] = []
    out_seq: list[int] = []
    for (i, o), c in items:
        in_seq.extend([i] * c)
        out_seq.extend([o] * c)
    return out_seq, in_seq


def _expand_undirected(items):
    """degree-histogram items → BD-normalized sequence (positives first,
    zeros appended, stable order), worker-side."""
    seq: list[int] = []
    for dgr, cnt in items:
        seq.extend([dgr] * cnt)
    return [d for d in seq if d > 0] + [d for d in seq if d == 0]


def graph_beta_codelength_batch(
    spark: SparkSession | None,
    hists: list,
    directed: bool,
    iterations: int = 50,
    alpha: float = 0.05,
    seed: int = 42,
) -> list[float]:
    """DS-model codelengths of MANY graphs in ONE MC fan-out job.

    ``hists``: {deg: count} dicts (undirected) or {(in, out): count}
    joint dicts (directed).  Results are identical to per-histogram
    calls (the rng stream depends only on (seed, iteration)); the point
    is that a Beta search round with dozens of pending evaluations pays
    one Spark job instead of one per (motif, cutoff).
    """
    from collections import Counter

    results: list[float | None] = [None] * len(hists)
    fns = []
    seq_bits_pending: list[float] = []
    for idx, h in enumerate(hists):
        # Closures ship ONLY the (degree, count) item list — O(distinct
        # degrees), never O(|V|).  The sequence expansion happens inside
        # the worker (deterministic given the sorted items, so results
        # are bit-identical to the old driver-side expansion).
        items = sorted((tuple(map(int, k)) if directed else int(k), int(c))
                       for k, c in h.items())
        if directed:
            def _marg_bits(marg):
                ks = np.array(sorted(marg), dtype=np.float64)
                cs = np.array(
                    [marg[int(k)] for k in sorted(marg)], dtype=np.float64
                )
                return _degree_hist_entropy_bits(ks, cs)

            marg_in: Counter = Counter()
            marg_out: Counter = Counter()
            for (i, o), c in items:
                marg_in[i] += c
                marg_out[o] += c
            seq_bits = _marg_bits(marg_in) + _marg_bits(marg_out)
            if all(i == 0 and o == 0 for (i, o), _ in items):
                results[idx] = float(seq_bits)
                continue
            fns.append(
                lambda rng, it=items: bd_sample_log_count_directed(
                    *_expand_directed(it), rng
                )
            )
        else:
            dv = np.array([k for k, _ in items], dtype=np.float64)
            dc = np.array([c for _, c in items], dtype=np.float64)
            seq_bits = _degree_hist_entropy_bits(dv, dc)
            if all(k == 0 for k, _ in items):
                results[idx] = float(seq_bits)
                continue
            fns.append(
                lambda rng, it=items: bd_sample_log_count(
                    _expand_undirected(it), rng
                )
            )
        seq_bits_pending.append(float(seq_bits))

    samples = _fanout_ln_samples(spark, fns, iterations, seed)
    j = 0
    for idx in range(len(hists)):
        if results[idx] is None:
            results[idx] = float(
                seq_bits_pending[j] + lognormal_upper(samples[j], alpha) / _LN2
            )
            j += 1
    return results  # type: ignore[return-value]


def beta_codelength(
    spark: SparkSession | None,
    deg_hist: dict[int, int],
    iterations: int = 50,
    alpha: float = 0.05,
    seed: int = 42,
) -> float:
    """DS-model codelength of an undirected graph: L(D) (ML code) +
    log2(upper-CI #graphs with D)."""
    return graph_beta_codelength_batch(
        spark, [deg_hist], False, iterations, alpha, seed
    )[0]


def motif_beta_hist(mask: int, k: int, directed: bool):
    """Degree histogram of the k-node motif: {deg: count} undirected,
    {(in, out): count} joint pairs directed."""
    from collections import Counter

    from motive_spark.motifs.canon import mask_to_edges

    medges = mask_to_edges(mask, k, directed)
    if directed:
        return dict(
            Counter(
                (
                    sum(1 for x, y in medges if y == i),
                    sum(1 for x, y in medges if x == i),
                )
                for i in range(k)
            )
        )
    return dict(
        Counter(sum(1 for x, y in medges if x == i or y == i) for i in range(k))
    )


def graph_beta_codelength(
    spark, joint_hist, directed: bool, iterations: int = 50,
    alpha: float = 0.05, seed: int = 42,
) -> float:
    """Dispatch: DS codelength of a whole graph from its degree histogram
    ({deg: count} undirected / {(in, out): count} directed)."""
    if directed:
        return beta_codelength_directed(spark, joint_hist, iterations, alpha, seed)
    return beta_codelength(spark, joint_hist, iterations, alpha, seed)


def size_beta(
    edges,
    occurrences,
    directed: bool = False,
    iterations: int = 50,
    alpha: float = 0.05,
    seed: int = 42,
    reset_wiring: bool = True,
    precomputed: dict | None = None,
):
    """Per-motif size/factor under the Beta model.

    Returns a list of dicts (canon, k, size_beta, factor_beta) — the
    MotifModel.sizeBeta surface (MotifModel.java:161-208 directed,
    310-357 undirected): motif DS bits + contraction DS bits + the shared
    structural terms, against the whole-graph DS baseline.

    The structural terms and the subbed degree histograms come back from
    the scale-out ``score_motifs_with_hists`` pass — one bounded row per
    motif; only the MC sampling loops run from the driver (each fanned
    out over Spark tasks).
    """
    from pyspark.sql import functions as F

    from motive_spark.mdl.score import precompute_globals, score_motifs_with_hists

    spark = edges.sparkSession
    pc = precomputed if precomputed is not None else precompute_globals(edges, directed)
    recs = score_motifs_with_hists(
        edges, occurrences, directed=directed, reset_wiring=reset_wiring,
        precomputed=pc,
    ).collect()
    baseline = graph_beta_codelength(
        spark, pc["joint"], directed, iterations, alpha, seed
    )

    masks = {
        int(r["canon"]): (int(r["k"]), int(r["mask"]))
        for r in occurrences.groupBy("canon", "k")
        .agg(F.first("mask").alias("mask"))
        .collect()
    }
    live = [rec for rec in recs if rec["subbed_hist"] is not None]
    # (max_rw-guarded motifs have no histogram → skipped, infinite size)
    sub_hists = [
        motif_beta_hist(masks[int(r["canon"])][1], masks[int(r["canon"])][0], directed)
        for r in live
    ]
    if directed:
        subbed_hists = [
            {(int(i), int(o)): int(c) for i, o, c in r["subbed_hist"]} for r in live
        ]
    else:
        subbed_hists = [
            {int(d): int(c) for d, c in r["subbed_hist"]} for r in live
        ]
    # ONE fan-out job for all motifs' subbed sequences; the tiny k-node
    # motif sequences sample locally
    sub_bits = graph_beta_codelength_batch(
        None, sub_hists, directed, iterations, alpha, seed
    )
    subbed_bits = graph_beta_codelength_batch(
        spark, subbed_hists, directed, iterations, alpha, seed
    )
    out = []
    for rec, sb, xb in zip(live, sub_bits, subbed_bits):
        canon = int(rec["canon"])
        size = sb + xb + rec["common_bits"]
        out.append(
            {
                "canon": canon,
                "k": masks[canon][0],
                "size_beta": size,
                "factor_beta": baseline - size,
            }
        )
    if precomputed is None:
        pc["e"].unpersist()
        pc["deg"].unpersist()
    return out


# --- directed (digraph) sampler -------------------------------------------


def _is_digraphic(out_res: np.ndarray, in_res: np.ndarray) -> bool:
    """Fulkerson–Chen–Anstee condition: does a simple digraph (no self
    loops) exist with these residual out/in sequences?"""
    if out_res.sum() != in_res.sum():
        return False
    if (out_res < 0).any() or (in_res < 0).any():
        return False
    n = len(out_res)
    order = np.lexsort((-in_res, -out_res))
    a = out_res[order]
    b = in_res[order]
    for k in range(1, n + 1):
        lhs = a[:k].sum()
        rhs = np.minimum(b[:k], k - 1).sum() + np.minimum(b[k:], k).sum()
        if lhs > rhs:
            return False
    return True


def bd_sample_log_count_directed(
    out_seq: list[int], in_seq: list[int], rng: np.random.Generator,
    max_restarts: int = 50,
) -> float:
    """One sequential importance sample → ln(1/(c q)) for the number of
    simple digraphs with the given out/in sequences.

    BD-style: repeatedly take the vertex with minimal positive residual
    out-degree and assign its out-edges to admissible targets
    (weight ∝ residual in-degree), guarding each assignment with the FCA
    residual check.  The FCA check ignores already-forbidden pairs, so a
    sample can rarely strand — such samples restart (bounded), which can
    bias the estimate slightly low; the exact-enumeration test bounds the
    effect (tests/test_beta.py::test_bd_directed_matches_exact_count).
    """
    for _ in range(max_restarts):
        out_res = np.asarray(out_seq, dtype=np.int64).copy()
        in_res = np.asarray(in_seq, dtype=np.int64).copy()
        n = len(out_res)
        if not _is_digraphic(out_res, in_res):
            raise ValueError("non-digraphic sequence")
        used: set[tuple[int, int]] = set()
        log_q = 0.0
        log_c = 0.0
        stuck = False
        while out_res.sum() > 0 and not stuck:
            pos = np.where(out_res > 0)[0]
            i = pos[np.argmin(out_res[pos])]
            log_c += math.lgamma(out_res[i] + 1.0)
            while out_res[i] > 0:
                cand, weights = [], []
                for j in range(n):
                    if j == i or in_res[j] <= 0 or (i, j) in used:
                        continue
                    out_res[i] -= 1
                    in_res[j] -= 1
                    ok = _is_digraphic(out_res, in_res)
                    out_res[i] += 1
                    in_res[j] += 1
                    if ok:
                        cand.append(j)
                        weights.append(in_res[j])
                if not cand:
                    stuck = True
                    break
                w = np.asarray(weights, dtype=np.float64)
                p = w / w.sum()
                idx = rng.choice(len(cand), p=p)
                j = cand[idx]
                log_q += math.log(p[idx])
                used.add((i, j))
                out_res[i] -= 1
                in_res[j] -= 1
        if not stuck:
            return -(log_c + log_q)
    raise RuntimeError("directed BD sampler stranded repeatedly")


def bd_log_count_samples_directed(
    spark: SparkSession | None,
    out_seq: list[int],
    in_seq: list[int],
    iterations: int = 50,
    seed: int = 42,
) -> np.ndarray:
    """``iterations`` independent ln-count estimates for the digraph
    count; Spark fan-out when a session is given (one seeded sample per
    task), else a local loop."""
    o = list(map(int, out_seq))
    i_ = list(map(int, in_seq))
    return _fanout_ln_samples(
        spark,
        [lambda rng: bd_sample_log_count_directed(o, i_, rng)],
        iterations,
        seed,
    )[0]


def beta_codelength_directed(
    spark: SparkSession | None,
    joint_hist: dict[tuple[int, int], int],
    iterations: int = 50,
    alpha: float = 0.05,
    seed: int = 42,
) -> float:
    """DS-model codelength of a digraph from its joint (in, out) degree
    histogram: L(D) (in + out marginal ML codes, the same D prior as the
    EL model) + log2(upper-CI #digraphs with this degree-pair multiset).

    The joint histogram — not the two marginals — determines the digraph
    count (two vertices with pairs (2,0),(0,2) admit different graphs
    than (2,2),(0,0) despite equal marginals).
    """
    return graph_beta_codelength_batch(
        spark, [joint_hist], True, iterations, alpha, seed
    )[0]
