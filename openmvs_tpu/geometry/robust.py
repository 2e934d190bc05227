"""Robust loss functors (libs/Math/RobustNorms.h equivalents).

Each norm maps a residual magnitude r to (rho, weight):
  rho(r)    — the robustified cost contribution,
  weight(r) — the IRLS weight rho'(r)/r used by reweighted least squares.

All are plain elementwise math, usable in numpy and inside jit.
"""

from __future__ import annotations

import numpy as np


def l2(r, scale=1.0):
    return 0.5 * r * r, np.ones_like(r)


def huber(r, scale=1.345):
    """Quadratic near zero, linear in the tails (RobustNorms.h Huber)."""
    a = np.abs(r)
    quad = a <= scale
    rho = np.where(quad, 0.5 * r * r, scale * (a - 0.5 * scale))
    w = np.where(quad, 1.0, scale / np.maximum(a, 1e-30))
    return rho, w


def tukey(r, scale=4.6851):
    """Hard redescending biweight: outliers beyond `scale` contribute a
    constant cost and zero gradient (RobustNorms.h Tukey)."""
    u = r / scale
    inl = np.abs(u) <= 1.0
    t = 1.0 - u * u
    rho = np.where(inl, (scale * scale / 6.0) * (1.0 - t * t * t),
                   scale * scale / 6.0)
    w = np.where(inl, t * t, 0.0)
    return rho, w


def geman_mcclure(r, scale=1.0):
    """Soft redescending norm rho = r^2/2 / (1 + (r/s)^2)
    (RobustNorms.h GemanMcClure)."""
    u2 = (r / scale) ** 2
    den = 1.0 + u2
    rho = 0.5 * r * r / den
    w = 1.0 / (den * den)
    return rho, w


def cauchy(r, scale=2.3849):
    u2 = (r / scale) ** 2
    rho = 0.5 * scale * scale * np.log1p(u2)
    w = 1.0 / (1.0 + u2)
    return rho, w


NORMS = {
    "l2": l2,
    "huber": huber,
    "tukey": tukey,
    "geman_mcclure": geman_mcclure,
    "cauchy": cauchy,
}
