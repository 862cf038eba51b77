"""Codelength primitives (bits) — vectorized numpy, driver- or UDF-side.

Mirrors the arithmetic surface of motive's MDL scoring (imports at
MotifModel.java:3-9; uses at :131-149, 454-470, 882-901).  The exact
prefix-code and adaptive-smoothing constants live in the unvendored
`nodes` dependency, so this module pins its own documented choices:

  * ``prefix_bits`` — Elias-gamma length of n+1 (a universal integer
    code, as Functions.prefix is).
  * online/adaptive codes use Krichevsky-Trofimov smoothing (alpha=0.5).

Any consistent universal-code choice shifts every motif's codelength by
the same structural terms, so compression-factor *comparisons* — the
reference's actual output (numbers.csv factors) — are preserved; the
engine's own fast-vs-slow tests enforce internal exactness at 1e-9
(the pattern of MotifModelTest.java:133-145).

Key analytic fact exploited throughout: the total codelength of an
adaptive (Laplace/KT) code over a sequence depends only on the MULTISET
of symbols, not their order —

    bits = -sum_s log2 Gamma-ratio(c_s, a) + log2 Gamma-ratio(N, aK)

so motive's sequential OnlineModel folds (wiringBits
MotifModel.java:454-470, storeIntegers :882-901) become closed-form
lgamma expressions over grouped counts: pure vectorized aggregation.
"""

from __future__ import annotations

import numpy as np

try:
    from scipy.special import gammaln as _gammaln  # type: ignore
except Exception:  # noqa: BLE001 — scipy not guaranteed in this container
    import math

    _gammaln = np.vectorize(math.lgamma, otypes=[np.float64])

_LN2 = float(np.log(2.0))


def _lg(x):
    """log2(Gamma(x)) for array or scalar x."""
    return _gammaln(np.asarray(x, dtype=np.float64)) / _LN2


def log2_factorial(n):
    """log2(n!) — MotifModel insertions term (MotifModel.java:147)."""
    return _lg(np.asarray(n, dtype=np.float64) + 1.0)


def log2_choose(k, n):
    """log2(n choose k) (labels term, MotifModel.java:136)."""
    n = np.asarray(n, dtype=np.float64)
    k = np.asarray(k, dtype=np.float64)
    return log2_factorial(n) - log2_factorial(k) - log2_factorial(n - k)


def prefix_bits(n):
    """Elias-gamma length of n+1: 2*floor(log2(n+1)) + 1 bits.

    Universal integer code standing in for Functions.prefix (nodes lib,
    call sites MotifModel.java:131, 136, 296).
    """
    n = np.asarray(n, dtype=np.float64)
    return 2.0 * np.floor(np.log2(n + 1.0)) + 1.0


def online_multiset_bits(counts, alphabet_size, alpha: float = 0.5):
    """Total bits of an adaptive code over a sequence with per-symbol
    counts ``counts`` drawn from an alphabet of ``alphabet_size``
    symbols, KT estimator P(s) = (c_s + alpha) / (N + alpha*K).

    Order-invariant closed form of OnlineModel observe-loops
    (MotifModel.java:454-470)::

        bits = -[ sum_s (lgG(c_s+a) - lgG(a)) - (lgG(N+aK) - lgG(aK)) ]
    """
    counts = np.asarray(counts, dtype=np.float64)
    k = float(alphabet_size)
    n = counts.sum()
    if n == 0 or k == 0:
        return 0.0
    num = np.sum(_lg(counts + alpha) - _lg(alpha))
    den = _lg(n + alpha * k) - _lg(alpha * k)
    return float(den - num)


def store_integers_bits(values, alpha: float = 0.5):
    """Bits to store a list of nonnegative ints: prefix(max) + adaptive
    code over alphabet 0..max (OnlineModel.storeIntegers semantics,
    call sites MotifModel.java:132, 700, 894-898)."""
    values = np.asarray(values, dtype=np.int64)
    if values.size == 0:
        return float(prefix_bits(0))
    mx = int(values.max())
    counts = np.bincount(values, minlength=mx + 1)
    return float(prefix_bits(mx)) + online_multiset_bits(counts, mx + 1, alpha)
