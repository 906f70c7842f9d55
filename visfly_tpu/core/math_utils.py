"""Small math helpers shared by reward/observation code."""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def safe_norm(x: Array, axis: int = -1, keepdims: bool = False) -> Array:
    """L2 norm with a zero (instead of NaN) gradient at x == 0.

    Forward values are bit-identical to ``jnp.linalg.norm`` — needed because
    reward terms like ``|ω|`` are evaluated at exactly-zero spawn states when
    differentiating through rollouts (BPTT), where the true norm has no
    gradient; torch's norm backward returns the zero subgradient there and the
    reference relies on that.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    is_zero = sq == 0
    safe = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(safe))
