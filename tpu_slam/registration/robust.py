"""Robust loss weights for iteratively-reweighted least squares."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def huber_weight(r: jax.Array, delta: float) -> jax.Array:
    """IRLS weight of the Huber loss: 1 inside delta, delta/|r| outside."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


def tukey_weight(r: jax.Array, c: float) -> jax.Array:
    """IRLS weight of the Tukey biweight: (1 - (r/c)^2)^2 inside c, 0 outside."""
    u = r / c
    w = jnp.square(1.0 - jnp.square(u))
    return jnp.where(jnp.abs(u) < 1.0, w, 0.0)


def cauchy_weight(r: jax.Array, c: float) -> jax.Array:
    return 1.0 / (1.0 + jnp.square(r / c))
