"""Variant-specific regularizers: Pati, adversarial (Fader), GMM KLs, GLSR.

Everything the reference computes with host numpy round-trips or Python
loops (e.g. `np.subtract.outer` in trainer.py:123, the K-component loop in
trainer_gmm.py:154-167, the per-sample rhythm-density loop in
trainer_glsr.py:141-171) is vectorized here and stays on device.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.losses.elbo import kl_diag_gaussians

LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Pati et al. 2019 attribute regularization (reference trainer.py:117-132)
# ---------------------------------------------------------------------------


def pati_regularizer(z_dim0: jax.Array, attr: jax.Array) -> jax.Array:
    """MSE( tanh(pairwise Δ z[:,0]), sign(pairwise Δ attr) ).

    z_dim0: (B,) — the regularized latent dimension; attr: (B,) densities.
    The reference computes the attribute outer difference on host numpy and
    ships it back to device; here it is one broadcast.
    """
    d_z = z_dim0[:, None] - z_dim0[None, :]
    d_attr = attr[:, None] - attr[None, :]
    return jnp.mean((jnp.tanh(d_z) - jnp.sign(d_attr)) ** 2)


# ---------------------------------------------------------------------------
# Fader adversarial loss (reference trainer_fader.py:105-110)
# ---------------------------------------------------------------------------


def adversarial_fader_loss(step, disc_out: jax.Array, density: jax.Array,
                           lmbda_max: float = 1e-4) -> jax.Array:
    """lambda(step) * MSE(discriminator, density); the gradient-reversal layer
    inside the model makes this adversarial for the encoder."""
    lmbda = jnp.minimum(step / 2000.0 * lmbda_max, lmbda_max)
    return lmbda * jnp.mean(
        (jnp.squeeze(disc_out) - jnp.squeeze(density)) ** 2)


# ---------------------------------------------------------------------------
# GM-VAE KL terms (reference trainer_gmm.py:109-196)
# ---------------------------------------------------------------------------


def gmm_unsupervised_kl(mu, std, qy_x, log_logit, mu_lookup, logvar_lookup,
                        free_bits: float = 0.0
                        ) -> Tuple[jax.Array, jax.Array]:
    """Unsupervised branch: sum_k qy_x[:,k] * KL[q(z|x) || p(z|k)]
    plus KL[q(y|x) || Uniform] (reference trainer_gmm.py:150-178).

    Reductions replicate the reference exactly: the latent KL is the
    per-sample *mean over D*, weighted, batch-meaned, summed over K; the
    class KL uses a *mean over K* inside the entropy term
    (trainer_gmm.py:170-176 — `torch.mean(..., dim=1)`).
    """
    logvar = jax.lax.stop_gradient(logvar_lookup)
    mu_p = mu_lookup                                  # (K, D)
    # The reference passes `logvar_lookup(k).exp_()` as the *scale* argument
    # of Normal (trainer_gmm.py:156) => stddev_p = exp(logvar), the same
    # log-sigma convention as the encoder heads.
    std_p = jnp.exp(logvar)
    kl = kl_diag_gaussians(mu[:, None, :], std[:, None, :],
                           mu_p[None], std_p[None])   # (B, K, D)
    if free_bits > 0.0:                               # per-dim floor (nats)
        kl = jnp.maximum(kl, free_bits)
    kl = jnp.mean(kl, axis=-1)                        # per-sample mean over D
    kld_lat = jnp.sum(jnp.mean(kl * qy_x, axis=0))    # weight, batch-mean, sum K

    n_component = qy_x.shape[-1]
    h = jnp.mean(qy_x * jax.nn.log_softmax(log_logit, axis=-1), axis=-1)
    kld_cls = jnp.mean(h - math.log(1.0 / n_component))
    return kld_lat, kld_cls


def gmm_supervised_kl(mu, std, y_label, qy_x, mu_lookup, logvar_lookup,
                      free_bits: float = 0.0
                      ) -> Tuple[jax.Array, jax.Array]:
    """Supervised branch: KL[q(z|x) || p(z|y_label)] + CE(qy_x, y)
    (reference trainer_gmm.py:180-194). NB the reference feeds the *softmax
    probabilities* qy_x into `nn.CrossEntropyLoss` (which applies another
    log_softmax) — replicated faithfully."""
    logvar = jax.lax.stop_gradient(logvar_lookup)
    mu_p = mu_lookup[y_label]                          # (B, D)
    std_p = jnp.exp(logvar)[y_label]
    kl = kl_diag_gaussians(mu, std, mu_p, std_p)
    if free_bits > 0.0:
        kl = jnp.maximum(kl, free_bits)
    kld_lat = jnp.mean(jnp.mean(kl, axis=-1))

    log_q = jax.nn.log_softmax(qy_x, axis=-1)          # double-softmax quirk
    ce = -jnp.mean(jnp.take_along_axis(log_q, y_label[:, None], axis=-1))
    return kld_lat, ce


# ---------------------------------------------------------------------------
# GLSR (Hadjeres et al.) — reference trainer_glsr.py:118-229
# ---------------------------------------------------------------------------

# Token-role masks over the 342 vocab (reference trainer_glsr.py:125,133):
# tokens 2..89 are note-on; 180..277 are the time-shift tokens used as
# step separators (from 30ms up).
_NOTE_ON_LO, _NOTE_ON_HI = 2, 90
_TIME_SEP_LO, _TIME_SEP_HI = 180, 278

# the two masses the GLSR soft attributes consume, as static vocab ranges
# for the fused masked-mass decoder kernel (order: played, separators)
GLSR_MASK_RANGES = ((_NOTE_ON_LO, _NOTE_ON_HI),
                    (_TIME_SEP_LO, _TIME_SEP_HI))


def _soft_masks(vocab: int, dtype):
    played = jnp.zeros((vocab,), dtype).at[_NOTE_ON_LO:_NOTE_ON_HI].set(1.0)
    sep = jnp.zeros((vocab,), dtype).at[_TIME_SEP_LO:_TIME_SEP_HI].set(1.0)
    return played, sep


def approx_played_notes(log_probs: jax.Array) -> jax.Array:
    """Soft count of note-on mass per step: (B, T). softmax of log-probs
    equals the probabilities, as in the reference."""
    probs = jax.nn.softmax(log_probs, axis=-1)
    played, _ = _soft_masks(log_probs.shape[-1], log_probs.dtype)
    return probs @ played


def approx_time_separators(log_probs: jax.Array) -> jax.Array:
    probs = jax.nn.softmax(log_probs, axis=-1)
    _, sep = _soft_masks(log_probs.shape[-1], log_probs.dtype)
    return probs @ sep


def approx_note_density(log_probs: jax.Array) -> jax.Array:
    """(B,) soft note count: sum over time of note-on mass
    (reference trainer_glsr.py:137-139)."""
    return jnp.sum(approx_played_notes(log_probs), axis=-1)


def approx_rhythm_density(log_probs: jax.Array,
                          faithful_batch0: bool = True) -> jax.Array:
    """Vectorized soft rhythm density (reference trainer_glsr.py:141-171).

    The reference iterates positions per sample: accumulate note-on mass
    until a separator (sep >= 0.9, non-differentiable threshold exactly as
    the reference's `.item()` compare), then add f(cur) where
    f(c) = 1 (zero gradient, via `cur/cur`) if c > 1e-2 else c; finally
    divide by the sample's total separator mass. The scan below reproduces
    that recurrence exactly, batched.
    """
    return rhythm_density_from_masses(approx_played_notes(log_probs),
                                      approx_time_separators(log_probs),
                                      faithful_batch0)


def rhythm_density_from_masses(played: jax.Array, sep: jax.Array,
                               faithful_batch0: bool = True) -> jax.Array:
    """`approx_rhythm_density` on precomputed (B, T) note-on / separator
    masses — the form the fused masked-mass decoder kernel emits
    (ops/pallas_gru.py::decoder_teacher_fused_masses).

    faithful_batch0 replicates the reference bug that indexes
    `played_notes[0][i]` — every sample accumulates batch element 0's
    note-on masses (trainer_glsr.py:154).
    """
    if faithful_batch0:
        played = jnp.broadcast_to(played[0:1], played.shape)

    boundary = sep >= 0.9                              # (B, T) bool, no grad

    def body(cur, inp):
        p_t, b_t = inp                                 # (B,), (B,) bool
        cur = cur + jnp.where(b_t, 0.0, p_t)
        # f(c): 1 with zero gradient when c > 1e-2, else c
        contrib = jnp.where(b_t,
                            jnp.where(cur > 1e-2, 1.0, cur),
                            0.0)
        cur = jnp.where(b_t, 0.0, cur)
        return cur, contrib

    _, contribs = jax.lax.scan(
        body, jnp.zeros(played.shape[0], played.dtype),
        (played.T, boundary.T))
    total = jnp.sum(contribs, axis=0)                  # (B,)
    return total / jnp.sum(sep, axis=-1)


def glsr_regularizer(decode_fn, z_r, z_n, chroma, rng,
                     epsilon: float = 1e-2,
                     faithful_batch0: bool = True,
                     masses_fn=None) -> Tuple[jax.Array, jax.Array]:
    """GLSR finite-difference latent supervision (reference
    trainer_glsr.py:173-229).

    Perturbs dim 0 of each stream by ±delta, delta = (1 + U[0,1)) * eps,
    decodes, estimates d(attr)/dz by central difference, and penalizes
    -log N(grad; 0, 1).

    `masses_fn(z_full) -> (played (B, steps), sep (B, steps))` is the
    production path (glsr_loss always supplies it): the soft attributes
    only consume note-on and time-separator probability masses, so the
    fused masked-mass decoder kernel
    (models.modules.global_decoder_teacher_masses) can supply them without
    ever materializing the (B, steps, V) log-probs. Identical numerics
    (softmax mask sums are exactly approx_played_notes /
    approx_time_separators).

    `decode_fn(z_full) -> (B, steps, V)` is the reference-shaped fallback
    (pass None when masses_fn is given): the teacher-forced decoder the
    reference uses in training mode (model.training => teacher forcing),
    with the soft attributes computed from full log-probs.
    """
    if masses_fn is None and decode_fn is None:
        raise ValueError("glsr_regularizer needs masses_fn or decode_fn")
    B = z_r.shape[0]
    kr, kn = jax.random.split(rng)
    d_r = (1.0 + jax.random.uniform(kr, (B,), z_r.dtype)) * epsilon
    d_n = (1.0 + jax.random.uniform(kn, (B,), z_n.dtype)) * epsilon

    # ONE decode for all four perturbations (r+, r-, n+, n-) stacked on the
    # batch axis: each sample's decode is independent, so this is exactly
    # the reference's four decodes, but a single kernel launch at 4B —
    # per-sequence cost drops with batch (see README batch-scaling row)
    z_all = jnp.concatenate([
        jnp.concatenate([z_r.at[:, 0].add(d_r), z_n, chroma], axis=-1),
        jnp.concatenate([z_r.at[:, 0].add(-d_r), z_n, chroma], axis=-1),
        jnp.concatenate([z_r, z_n.at[:, 0].add(d_n), chroma], axis=-1),
        jnp.concatenate([z_r, z_n.at[:, 0].add(-d_n), chroma], axis=-1),
    ], axis=0)
    if masses_fn is not None:
        played, sep = masses_fn(z_all)
        pl_rp, pl_rm, pl_np, pl_nm = jnp.split(played, 4, axis=0)
        sp_rp, sp_rm = jnp.split(sep[: 2 * B], 2, axis=0)
        rd_p = rhythm_density_from_masses(pl_rp, sp_rp, faithful_batch0)
        rd_m = rhythm_density_from_masses(pl_rm, sp_rm, faithful_batch0)
        nd_p = jnp.sum(pl_np, axis=-1)
        nd_m = jnp.sum(pl_nm, axis=-1)
    else:
        lp_rp, lp_rm, lp_np, lp_nm = jnp.split(decode_fn(z_all), 4, axis=0)
        rd_p = approx_rhythm_density(lp_rp, faithful_batch0)
        rd_m = approx_rhythm_density(lp_rm, faithful_batch0)
        nd_p = approx_note_density(lp_np)
        nd_m = approx_note_density(lp_nm)

    def loss_of(a_p, a_m, deltas):
        grad_attr = jnp.squeeze(a_p - a_m) / (2.0 * deltas)
        return jnp.mean(0.5 * grad_attr ** 2 + 0.5 * LOG_2PI)

    return loss_of(rd_p, rd_m, d_r), loss_of(nd_p, nd_m, d_n)
