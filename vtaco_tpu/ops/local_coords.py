"""Local-coordinate mapping + NeRF positional encoding for crop models.

Counterpart of src/common.py:434-474 (map2local / positional_encoding).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

_L = 10
FREQ_BANDS = (2.0 ** np.linspace(0, _L - 1, _L)) * math.pi


def positional_encoding(p, basis_function: str = "sin_cos"):
    """sin/cos encoding over 10 octave frequency bands (common.py:452-474).

    Input (..., D) in [0, 1] → output (..., D * 2L) when 'sin_cos', else
    passthrough ('linear').
    """
    if basis_function != "sin_cos":
        return p
    p = 2.0 * p - 1.0
    out = []
    for freq in FREQ_BANDS:
        out.append(jnp.sin(freq * p))
        out.append(jnp.cos(freq * p))
    return jnp.concatenate(out, axis=-1)


def map2local(p, s: float, pos_encoding: str = "linear"):
    """Map points into their local voxel frame, scaled to [0, 1)
    (common.py:434-450), then positionally encode."""
    p = jnp.remainder(p, s) / s
    return positional_encoding(p, pos_encoding)
