"""Global norms and dot products (reference modules_indiv.h:70-92)."""
from __future__ import annotations

import jax.numpy as jnp


def global_norm(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))


def normalize(v: jnp.ndarray):
    """Return (v / ||v||, ||v||) — the rescale=1 path of f_g_norm."""
    n = global_norm(v)
    return v / n, n


def cdot(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Complex inner product <u, v> = sum conj(u) * v."""
    return jnp.sum(jnp.conj(u) * v)
