"""Arrow-vectorized, BIT-EXACT twins of the HOF hot loops.

Catalyst's higher-order functions (``zip_with`` + ``aggregate`` folds) are
the portable way to write per-element array arithmetic, but they run
INTERPRETED — measured ~40 wall-µs per 64-dim pair cosine at the sf10
stretch point (PERF.md finding 35), which makes them the bottleneck of
every quadratic stage they appear in.  The functions here run the same
arithmetic inside ``mapInPandas`` / ``applyInPandas`` on numpy float64 —
Arrow batch transfer, no per-row Python — while reproducing the HOF
results BIT-FOR-BIT, so every DuckDB oracle and python twin pinned to the
expression form stays valid:

- **Same accumulation order.**  The expression folds are left-to-right
  over dimensions (``aggregate(zip_with(...), 0.0, acc+x)``).  The numpy
  twins accumulate with an explicit dim loop — ``acc += d*d`` per
  dimension, vectorized over ROWS — so each row's float64 operation
  sequence is identical (numpy ufuncs are exactly-rounded IEEE ops and
  never fuse multiply-add).
- **Same rounding.**  Spark's ``F.round`` on doubles is
  ``BigDecimal(Double.toString(x)).setScale(s, HALF_UP).doubleValue()`` —
  half-up on the SHORTEST-DECIMAL representation, not on the binary
  value.  :func:`round_half_up` reproduces it vectorized: the fast path
  rounds the binary value (``floor(x*10^s + 0.5)`` away from zero, exact
  because the scaled integers stay below 2^53 for the magnitudes these
  pipelines round, then one correctly-rounded division back), and every
  element whose scaled fractional part sits within 1e-8 of the 0.5
  boundary — the only place shortest-decimal and binary rounding can
  split — is redone exactly through ``decimal`` on ``repr(x)``.
  Expected fallback rate ~1e-8 of elements: the loop is nanoscale, but
  without it a 1-ulp tie eventually flips a 6-digit contract value (the
  sf0.1 sweep caught five such scale-dependent ties in expression code;
  this module refuses to reintroduce the class).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def _round_half_up_scalar(x: float, scale: int) -> float:
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def round_half_up(a: np.ndarray, scale: int) -> np.ndarray:
    """Vectorized Spark ``F.round(col, scale)`` for float64 arrays (see
    module docstring for the two-tier exactness argument)."""
    s = float(10.0**scale)
    scaled = a * s
    # HALF_UP is away-from-zero on the .5 boundary
    with np.errstate(invalid="ignore"):
        fast = np.where(
            scaled >= 0.0, np.floor(scaled + 0.5), np.ceil(scaled - 0.5)
        ) / s
        frac = np.abs(scaled - np.floor(scaled) - 0.5)
        # The boundary guard must scale with the float spacing of the
        # SCALED value: above |scaled| ~ 5e7, ulp(scaled) > 1e-8, so a
        # shortest-decimal half-boundary (e.g. 2098.9539385 at scale 6)
        # sits more than 1e-8 from binary 0.5 yet still ties in decimal.
        # 4*spacing covers the scaling multiply's rounding plus the two
        # subtractions in frac; the 1e-8 floor keeps the small-magnitude
        # behaviour (and fallback rate) of the original guard.
        tol = np.maximum(1e-8, 4.0 * np.spacing(np.abs(scaled)))
        suspicious = (frac < tol) & np.isfinite(scaled)
    if suspicious.any():
        idx = np.flatnonzero(suspicious)
        flat = np.ascontiguousarray(fast).ravel()
        flat[idx] = [
            _round_half_up_scalar(float(v), scale) for v in a.ravel()[idx]
        ]
        fast = flat.reshape(a.shape)
    return fast


def seq_sqdist(V: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Row-wise squared distance with the fold's dim order:
    ``((0 + d0^2) + d1^2) + ...`` — bit-identical to ``_sqdist_expr``."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        d = V[:, j] - c[j]
        acc += d * d
    return acc


def seq_norm(V: np.ndarray) -> np.ndarray:
    """Row-wise ``sqrt(sum(x^2))`` in fold order — twin of ``norm_expr``
    (IEEE sqrt is correctly rounded on both engines)."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        x = V[:, j]
        acc += x * x
    return np.sqrt(acc)


def seq_dot_vec(V: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Row-wise dot against ONE vector — ``out[i] = dot(V[i], c)`` in fold
    order, the twin of ``dot_expr(row, literal_centroid)`` (the cell
    assign/probe loops)."""
    acc = np.zeros(V.shape[0], dtype=np.float64)
    for j in range(V.shape[1]):
        acc += V[:, j] * c[j]
    return acc


def seq_dot_rows(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-PAIRED dot products — ``out[i] = dot(A[i], B[i])`` accumulated
    dim-sequentially, the twin of ``dot_expr`` evaluated on a joined pair
    relation (one candidate pair per row).  Not a matmul for the same
    reason as :func:`seq_dot_block`."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        acc += A[:, j] * B[:, j]
    return acc


def seq_dot_block(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """All-pairs dot products between the rows of ``A`` (m x d) and ``B``
    (n x d) as an m x n matrix, accumulated dim-sequentially so every
    entry matches ``dot_expr`` bit-for-bit.  Deliberately NOT ``A @ B.T``:
    BLAS reassociates the sum, and a last-ulp difference at a rounding
    boundary would diverge from the expression form the oracles replay."""
    out = np.zeros((A.shape[0], B.shape[0]), dtype=np.float64)
    tmp = np.empty_like(out)
    for j in range(A.shape[1]):
        np.multiply(A[:, j][:, None], B[:, j][None, :], out=tmp)
        out += tmp
    return out
