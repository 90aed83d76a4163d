"""Sampling / feedback ops shared by all models."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def argmax_one_hot(logits: jax.Array) -> jax.Array:
    """Greedy feedback: one-hot of the argmax class.

    Equivalent of the reference `_sampling` (reference model_v2.py:72-79):
    deterministic argmax, not stochastic sampling — required for faithful
    controllability evaluation.
    """
    idx = jnp.argmax(logits, axis=-1)
    return jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)


def reparameterize(rng, mu: jax.Array, stddev: jax.Array) -> jax.Array:
    """z = mu + stddev * eps, eps ~ N(0, 1) (reference model_v2.py:152-158).

    `stddev` is exp(logsig) — the reference's `var` linear layers actually
    predict log-sigma which is exponentiated before use
    (reference model_v2.py:85 `.exp_()`).
    """
    eps = jax.random.normal(rng, stddev.shape, dtype=stddev.dtype)
    return mu + stddev * eps


@jax.custom_vjp
def grad_reverse(x: jax.Array, alpha: float = 1.0) -> jax.Array:
    """Gradient reversal layer (reference model_v2.py:426-435 `ReverseLayerF`):
    identity forward, `-alpha * g` backward. Drives the FaderNets adversarial
    discriminator without a separate optimizer."""
    return x


def _grad_reverse_fwd(x, alpha):
    return x, alpha


def _grad_reverse_bwd(alpha, g):
    return (-alpha * g, None)


grad_reverse.defvjp(_grad_reverse_fwd, _grad_reverse_bwd)
