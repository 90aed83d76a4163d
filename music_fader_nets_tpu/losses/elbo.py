"""ELBO terms shared by all trainers (reference trainer.py:87-114 and copies).

All functions are pure and jit-safe (no Python branching on traced values).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def anneal_beta(step: jax.Array, beta: float, faithful: bool = True,
                warmup_steps: int = 0) -> jax.Array:
    """KL annealing schedule (reference trainer.py:93-96).

    faithful=True replicates the reference exactly, INCLUDING the quirk that
    `min((step - 10000) / 10000 * beta, beta)` is *negative* for steps in
    (1000, 10000) (SURVEY.md §2.4). faithful=False clamps at zero.

    warmup_steps > 0 (a repo extension, ModelConfig.kl_warmup_steps)
    replaces the schedule with a plain linear 0 -> beta warmup — the
    reference schedule stays at 0 until step 10000, which means short runs
    never apply KL at all.
    """
    if warmup_steps > 0:
        return beta * jnp.clip(step / float(warmup_steps), 0.0, 1.0)
    ramp = jnp.minimum((step - 10000.0) / 10000.0 * beta, beta)
    if not faithful:
        ramp = jnp.maximum(ramp, 0.0)
    return jnp.where(step < 1000, 0.0, ramp)


def nll_mean(log_probs: jax.Array, targets: jax.Array) -> jax.Array:
    """`F.nll_loss(logp.view(-1, C), t.view(-1), reduction='mean')`
    (reference trainer.py:98-103): mean over ALL positions — padding tokens
    included, exactly like the reference (no ignore_index)."""
    lp = log_probs.reshape(-1, log_probs.shape[-1])
    t = targets.reshape(-1)
    picked = jnp.take_along_axis(lp, t[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def kl_std_normal(mu: jax.Array, std: jax.Array,
                  free_bits: float = 0.0) -> jax.Array:
    """mean KL( N(mu, std) || N(0, 1) ) over every element, matching
    `kl_divergence(dis, std_normal).mean()` (reference trainer.py:107-112).

    free_bits > 0 floors each element's KL at that many nats before the
    mean (Kingma et al. 2016): dims already below the floor feel no KL
    pressure, which protects the attribute-regularized dims from collapse.
    A repo extension (ModelConfig.free_bits); 0 = reference behavior."""
    kl = -jnp.log(std) + 0.5 * (std ** 2 + mu ** 2) - 0.5
    if free_bits > 0.0:
        kl = jnp.maximum(kl, free_bits)
    return jnp.mean(kl)


def kl_diag_gaussians(mu_q, std_q, mu_p, std_p) -> jax.Array:
    """Elementwise KL( N(mu_q, std_q) || N(mu_p, std_p) ); caller reduces."""
    return (jnp.log(std_p / std_q)
            + (std_q ** 2 + (mu_q - mu_p) ** 2) / (2.0 * std_p ** 2) - 0.5)
