"""Central finite-difference gradients (SURVEY.md §2 "CPU reference
renderer ... FD gradient checker"; the validation oracle of BASELINE.json:2
"grad allclose vs FD reference").

Works on any scalar function of a flat parameter array; used by
tests/test_grads.py to validate jax.grad of the renderer at fixed hit
topology (the measure-zero silhouette caveat is documented in SURVEY.md
§7.2.2: FD points are chosen away from visibility edges).
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def fd_grad(
    f: Callable[[np.ndarray], float],
    x: np.ndarray,
    eps: float = 1e-3,
) -> np.ndarray:
    """Central differences: df/dx_i = (f(x+e_i) - f(x-e_i)) / (2 eps)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    flat = x.reshape(-1)
    gf = g.reshape(-1)
    for i in range(flat.shape[0]):
        xp = flat.copy()
        xm = flat.copy()
        xp[i] += eps
        xm[i] -= eps
        gf[i] = (
            float(f(xp.reshape(x.shape))) - float(f(xm.reshape(x.shape)))
        ) / (2.0 * eps)
    return g
