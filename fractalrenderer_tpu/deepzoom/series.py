"""Series approximation for perturbation deep zoom.

The reference declared this capability (fractal_state.h:89-90
``use_series_approximation``/``series_order``; skip heuristic sketched in
the unwired mandelbrot_deep_zoom.comp:109-117) but never wired it.  This is
the real thing, in the standard Kalles-Fraktaler form:

δ_n is approximated by a cubic series in δc along the reference orbit:
    δ_n ≈ A_n·δc + B_n·δc² + C_n·δc³
with host-side recurrences (complex doubles, O(L) work):
    A_{n+1} = 2·Z_n·A_n + 1
    B_{n+1} = 2·Z_n·B_n + A_n²
    C_{n+1} = 2·Z_n·C_n + 2·A_n·B_n

``n_skip`` is the largest n where the truncation term stays below ``tol``
of the series value for the largest |δc| in the view AND |δ_n| stays small.
With bailout ≥ 4 and |Z_n| ≤ 2 pre-escape, |z| ≤ |Z| + |δ| < bailout, so no
pixel can escape during the skipped iterations — the skip is *exact* with
respect to iteration counts.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np


@dataclass(frozen=True)
class SeriesSkip:
    n_skip: int                 # orbit index the kernel starts at (>= 1)
    a: complex                  # A_{n_skip}
    b: complex
    c: complex


def compute_series_skip(orbit: np.ndarray, dc_max: float,
                        tol: float = 1e-6,
                        delta_cap: float = 1e-3) -> SeriesSkip:
    """Walk the orbit accumulating A/B/C and return the deepest safe skip.

    ``dc_max``: the largest |δc| over the view (pixel furthest from the
    reference).  Returns n_skip=1 (no skip) when nothing is safe.
    """
    L = len(orbit)
    A, B, C = 0j, 0j, 0j
    best = SeriesSkip(1, 1.0 + 0j, 0j, 0j)
    for n in range(L - 1):
        Z = complex(orbit[n, 0], orbit[n, 1])
        A, B, C = (2.0 * Z * A + 1.0,
                   2.0 * Z * B + A * A,
                   2.0 * Z * C + 2.0 * A * B)
        # series value/terms at the worst-case pixel
        t1 = abs(A) * dc_max
        t2 = abs(B) * dc_max * dc_max
        t3 = abs(C) * dc_max * dc_max * dc_max
        delta_est = t1 + t2 + t3
        if not np.isfinite(delta_est):
            break
        # truncation must be negligible and δ must stay far below bailout
        if t3 > tol * max(t1, 1e-300) or delta_est > delta_cap:
            break
        # n+1 is the orbit index of δ_{n+1}; valid start point
        best = SeriesSkip(n + 1, A, B, C)
    return best


def series_delta_coeffs(skip: SeriesSkip) -> Tuple[float, ...]:
    """Flatten to f32-friendly scalars for the kernel params."""
    return (skip.a.real, skip.a.imag, skip.b.real, skip.b.imag,
            skip.c.real, skip.c.imag, float(skip.n_skip))
