"""Numerically-safe density activation.

Forward is an exact exp; the derivative is computed from the input clamped to
[-12, 12] so huge density logits cannot blow up gradients (behavioral parity
with the reference's truncated-exp autograd Function, tools/activation.py:6-21).
"""

import jax
import jax.numpy as jnp


@jax.custom_jvp
def trunc_exp(x):
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = jnp.exp(x)
    dy = jnp.exp(jnp.clip(x, -12.0, 12.0)) * dx
    return y, dy
