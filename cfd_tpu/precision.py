"""Precision policy helpers.

The reference solvers are double-precision C++ with 1e-9-relative Poisson
tolerances (cavity-01.cpp:317) that are unreachable in float32, so validation
configs are f64 and performance configs f32 (SURVEY.md section 7, "hard
parts"). JAX silently truncates f64 requests to f32 unless the x64 flag is
set, which turns every Poisson solve into a max-iteration burn; case
factories call :func:`ensure_dtype_enabled` so asking for an f64 case is
sufficient.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def ensure_dtype_enabled(dtype) -> None:
    """Enable jax_enable_x64 if ``dtype`` is a 64-bit float and it's off."""
    if np.dtype(dtype) == np.float64 and not jax.config.jax_enable_x64:
        jax.config.update("jax_enable_x64", True)


def default_dtype() -> jnp.dtype:
    """f64 when x64 is enabled (validation), else f32 (performance)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
