"""Per-model loss bundles.

Each objective is a pure function
    loss_fn(params, rng, batch, step, cfg) -> (loss, metrics)
usable under `jax.value_and_grad(..., has_aux=True)` inside a jitted train
step. One-hot expansion happens on device (`jax.nn.one_hot`) — cheaper than
the reference's per-batch `scatter_` on host-shaped tensors
(reference trainer.py:189-196).

The six bundles mirror the reference's six trainer scripts (SURVEY.md §2.3):
vanilla (trainer.py), gmm (trainer_gmm.py), glsr (trainer_glsr.py),
cvae (trainer_cvae.py), fader (trainer_fader.py), singlevae
(trainer_singlevae.py).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.losses.elbo import anneal_beta, kl_std_normal, nll_mean
from music_fader_nets_tpu.losses.regularizers import (
    GLSR_MASK_RANGES,
    adversarial_fader_loss,
    glsr_regularizer,
    gmm_supervised_kl,
    gmm_unsupervised_kl,
    pati_regularizer,
)
from music_fader_nets_tpu.models import gmvae, vae
from music_fader_nets_tpu.models.modules import global_decoder_teacher_masses
from music_fader_nets_tpu.models.vae import _global_view

Metrics = Dict[str, jax.Array]


def _compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


def _mixed_precision(params, batch, cfg: ModelConfig):
    """Mixed precision (cfg.dtype='bfloat16'): params and inputs cast to
    bf16 at forward entry; logits are upcast before every log_softmax
    (models/modules.py) and the loss terms below run in f32. Gradients flow
    through the casts back to the f32 master params (standard mixed
    precision)."""
    dt = _compute_dtype(cfg)
    if dt == jnp.float32:
        return params, batch, dt
    return _cast_tree(params, dt), dict(batch, c=batch["c"].astype(dt)), dt


def _one_hots(batch, cfg: ModelConfig, dtype=jnp.float32):
    x_oh = jax.nn.one_hot(batch["x"], cfg.roll_dims, dtype=dtype)
    r_oh = jax.nn.one_hot(batch["r"], cfg.rhythm_dims, dtype=dtype)
    n_oh = jax.nn.one_hot(batch["n"], cfg.note_dims, dtype=dtype)
    return x_oh, r_oh, n_oh


def _recon_ce(fwd, batch, cfg: ModelConfig):
    ce_x = _ce_x(fwd, batch)
    ce_r = nll_mean(fwd["r_out"], batch["r"])
    ce_n = nll_mean(fwd["n_out"], batch["n"])
    return ce_x, ce_r, ce_n


def _ce_x(fwd, batch):
    """Token-stream CE: from the fused decode+CE kernel's per-position NLL
    when present (padding included either way, = nll_mean semantics)."""
    if fwd.get("nll_x") is not None:
        return jnp.mean(fwd["nll_x"].astype(jnp.float32))
    return nll_mean(fwd["out"], batch["x"])


# ---------------------------------------------------------------------------


def vanilla_loss(params, rng, batch, step, cfg: ModelConfig,
                 train: bool = True) -> Tuple[jax.Array, Metrics]:
    """ELBO + Pati attribute regularization (reference trainer.py:87-132)."""
    params, batch, dt = _mixed_precision(params, batch, cfg)
    x_oh, r_oh, n_oh = _one_hots(batch, cfg, dtype=dt)
    fwd = vae.reg_vae_forward(params, rng, x_oh, r_oh, n_oh, batch["c"],
                              cfg, train=train, tokens=batch["x"],
                              nll_targets=batch["x"],
                              track_ids=(batch["r"], batch["n"]))
    fwd = _cast_tree(fwd, jnp.float32)
    ce_x, ce_r, ce_n = _recon_ce(fwd, batch, cfg)
    ce = cfg.ce_x_weight * ce_x + ce_r + ce_n
    kld = (kl_std_normal(fwd["mu_r"], fwd["std_r"], cfg.free_bits)
           + kl_std_normal(fwd["mu_n"], fwd["std_n"], cfg.free_bits))
    beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                         cfg.kl_warmup_steps)
    l_r = pati_regularizer(fwd["z_r"][:, 0], batch["r_density"])
    l_n = pati_regularizer(fwd["z_n"][:, 0], batch["n_density"])
    loss = ce + beta0 * kld + l_r + l_n
    return loss, {"loss": loss, "CE_X": ce_x, "CE_R": ce_r, "CE_N": ce_n,
                  "l_r": l_r, "l_n": l_n, "KLD": kld}


# ---------------------------------------------------------------------------


def gmm_loss(params, rng, batch, step, cfg: ModelConfig,
             is_supervised: bool = False, train: bool = True
             ) -> Tuple[jax.Array, Metrics]:
    """GM-VAE loss, unsupervised (Yamaha) or supervised (VGMIDI arousal)
    branch (reference trainer_gmm.py:109-196), + Pati regularization."""
    params, batch, dt = _mixed_precision(params, batch, cfg)
    x_oh, r_oh, n_oh = _one_hots(batch, cfg, dtype=dt)
    fwd = gmvae.reg_gmvae_forward(params, rng, x_oh, r_oh, n_oh, batch["c"],
                                  cfg, train=train, tokens=batch["x"],
                                  nll_targets=batch["x"],
                                  track_ids=(batch["r"], batch["n"]))
    fwd = _cast_tree(fwd, jnp.float32)
    ce_x, ce_r, ce_n = _recon_ce(fwd, batch, cfg)
    ce = cfg.ce_x_weight * ce_x + ce_r + ce_n
    beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                         cfg.kl_warmup_steps)

    if not is_supervised:
        kld_lat_r, kld_cls_r = gmm_unsupervised_kl(
            fwd["mu_r"], fwd["std_r"], fwd["qy_x_r"], fwd["log_logit_r"],
            params["mu_r_lookup"], params["logvar_r_lookup"],
            cfg.free_bits)
        kld_lat_n, kld_cls_n = gmm_unsupervised_kl(
            fwd["mu_n"], fwd["std_n"], fwd["qy_x_n"], fwd["log_logit_n"],
            params["mu_n_lookup"], params["logvar_n_lookup"],
            cfg.free_bits)
        loss = ce + beta0 * (kld_lat_r + kld_lat_n + kld_cls_r + kld_cls_n)
        clf = jnp.zeros(())
    else:
        y = batch["a"].astype(jnp.int32)
        kld_lat_r, clf_r = gmm_supervised_kl(
            fwd["mu_r"], fwd["std_r"], y, fwd["qy_x_r"],
            params["mu_r_lookup"], params["logvar_r_lookup"],
            cfg.free_bits)
        kld_lat_n, clf_n = gmm_supervised_kl(
            fwd["mu_n"], fwd["std_n"], y, fwd["qy_x_n"],
            params["mu_n_lookup"], params["logvar_n_lookup"],
            cfg.free_bits)
        kld_cls_r = kld_cls_n = jnp.zeros(())
        clf = clf_r + clf_n
        loss = ce + beta0 * (kld_lat_r + kld_lat_n) + clf

    l_r = pati_regularizer(fwd["z_r"][:, 0], batch["r_density"])
    l_n = pati_regularizer(fwd["z_n"][:, 0], batch["n_density"])
    loss = loss + l_r + l_n
    return loss, {"loss": loss, "CE_X": ce_x, "CE_R": ce_r, "CE_N": ce_n,
                  "l_r": l_r, "l_n": l_n,
                  "kld_latent": kld_lat_r + kld_lat_n,
                  "kld_class": kld_cls_r + kld_cls_n, "clf": clf}


# ---------------------------------------------------------------------------


def glsr_loss(params, rng, batch, step, cfg: ModelConfig,
              train: bool = True) -> Tuple[jax.Array, Metrics]:
    """Vanilla ELBO + GLSR finite-difference regularizer
    (reference trainer_glsr.py:87-229). The GLSR decodes are teacher-forced
    — the reference model is in training mode during the extra decodes —
    and are gated on step > 20 (trainer_glsr.py:253) via a lazily-valued
    `where` (both branches compile; the decode cost is inherent to GLSR)."""
    # GLSR stays f32: its central-difference gradient estimate is
    # precision-sensitive (deltas ~1e-2 on soft densities)
    x_oh, r_oh, n_oh = _one_hots(batch, cfg)
    rng_fwd, rng_glsr = jax.random.split(rng)
    fwd = vae.reg_vae_forward(params, rng_fwd, x_oh, r_oh, n_oh, batch["c"],
                              cfg, train=train, tokens=batch["x"],
                              nll_targets=batch["x"],
                              track_ids=(batch["r"], batch["n"]))
    ce_x, ce_r, ce_n = _recon_ce(fwd, batch, cfg)
    ce = cfg.ce_x_weight * ce_x + ce_r + ce_n
    kld = (kl_std_normal(fwd["mu_r"], fwd["std_r"], cfg.free_bits)
           + kl_std_normal(fwd["mu_n"], fwd["std_n"], cfg.free_bits))
    beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                         cfg.kl_warmup_steps)

    steps = min(cfg.eval_decode_steps, x_oh.shape[1])
    gview = _global_view(params)

    def masses_fn(z_full):
        # the soft attributes only need note-on / time-separator probability
        # masses — on the TPU kernel path the fused masked-mass decoder
        # emits them directly and the (4B, T, V) log-probs never exist; the
        # 4 perturbation copies share their teacher tokens (n_rep), so the
        # kernel embeds them once per step
        n_rep = z_full.shape[0] // x_oh.shape[0]
        return global_decoder_teacher_masses(gview, z_full,
                                             x_oh[:, :steps],
                                             batch["x"][:, :steps],
                                             GLSR_MASK_RANGES,
                                             use_pallas=cfg.use_pallas_gru,
                                             n_rep=n_rep)

    l_r, l_n = glsr_regularizer(None, fwd["z_r"], fwd["z_n"], batch["c"],
                                rng_glsr,
                                faithful_batch0=cfg.faithful_glsr_batch0,
                                masses_fn=masses_fn)
    gate = (step > 20).astype(l_r.dtype)
    loss = ce + beta0 * kld + gate * (l_r + l_n)
    return loss, {"loss": loss, "CE_X": ce_x, "CE_R": ce_r, "CE_N": ce_n,
                  "l_r": gate * l_r, "l_n": gate * l_n, "KLD": kld}


# ---------------------------------------------------------------------------


def cvae_loss(params, rng, batch, step, cfg: ModelConfig,
              train: bool = True) -> Tuple[jax.Array, Metrics]:
    """CE_X + annealed KLD only (reference trainer_cvae.py:84-102)."""
    params, batch, dt = _mixed_precision(params, batch, cfg)
    x_oh, _, _ = _one_hots(batch, cfg, dtype=dt)
    rd = batch["r_density"][:, None].astype(dt)
    nd = batch["n_density"][:, None].astype(dt)
    fwd = vae.cvae_forward(params, rng, x_oh, batch["c"], rd, nd, cfg,
                           train=train, tokens=batch["x"],
                           nll_targets=batch["x"])
    fwd = _cast_tree(fwd, jnp.float32)
    ce_x = _ce_x(fwd, batch)
    kld = kl_std_normal(fwd["mu"], fwd["std"], cfg.free_bits)
    beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                         cfg.kl_warmup_steps)
    loss = ce_x + beta0 * kld
    return loss, {"loss": loss, "CE_X": ce_x, "KLD": kld}


# ---------------------------------------------------------------------------


def fader_loss(params, rng, batch, step, cfg: ModelConfig,
               train: bool = True) -> Tuple[jax.Array, Metrics]:
    """CVAE loss + ramped adversarial MSE through the gradient-reversed
    discriminators (reference trainer_fader.py:84-135)."""
    params, batch, dt = _mixed_precision(params, batch, cfg)
    x_oh, _, _ = _one_hots(batch, cfg, dtype=dt)
    rd = batch["r_density"][:, None].astype(dt)
    nd = batch["n_density"][:, None].astype(dt)
    fwd = vae.fader_forward(params, rng, x_oh, batch["c"], rd, nd, cfg,
                            train=train, tokens=batch["x"],
                            nll_targets=batch["x"])
    fwd = _cast_tree(fwd, jnp.float32)
    ce_x = _ce_x(fwd, batch)
    kld = kl_std_normal(fwd["mu"], fwd["std"], cfg.free_bits)
    beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                         cfg.kl_warmup_steps)
    l_adv_r = adversarial_fader_loss(step, fwd["disc_r"],
                                     rd.astype(jnp.float32))
    l_adv_n = adversarial_fader_loss(step, fwd["disc_n"],
                                     nd.astype(jnp.float32))
    loss = ce_x + beta0 * kld + l_adv_r + l_adv_n
    return loss, {"loss": loss, "CE_X": ce_x, "KLD": kld,
                  "l_adv_r": l_adv_r, "l_adv_n": l_adv_n}


# ---------------------------------------------------------------------------


def singlevae_loss(params, rng, batch, step, cfg: ModelConfig,
                   train: bool = True) -> Tuple[jax.Array, Metrics]:
    """5*CE_X + beta*KLD (NO annealing — the reference uses raw beta,
    trainer_singlevae.py:107) + Pati reg on z[:,0] (rhythm) and z[:,1]
    (note) of the single latent (trainer_singlevae.py:110-123).

    kl_warmup_steps (the repo's --kl-warmup extension) still applies: its
    documented meaning is "replace the family's KL weight schedule with a
    linear 0 -> beta warmup", and for this family the schedule is the
    constant raw beta — without this the flag would be a silent no-op on
    trainer_singlevae.py alone."""
    params, batch, dt = _mixed_precision(params, batch, cfg)
    x_oh, _, _ = _one_hots(batch, cfg, dtype=dt)
    fwd = vae.single_vae_forward(params, rng, x_oh, batch["c"], cfg,
                                 train=train, tokens=batch["x"],
                                 nll_targets=batch["x"])
    fwd = _cast_tree(fwd, jnp.float32)
    ce_x = _ce_x(fwd, batch)
    kld = kl_std_normal(fwd["mu"], fwd["std"], cfg.free_bits)
    l_r = pati_regularizer(fwd["z"][:, 0], batch["r_density"])
    l_n = pati_regularizer(fwd["z"][:, 1], batch["n_density"])
    if cfg.kl_warmup_steps > 0:
        beta0 = anneal_beta(step, cfg.beta, cfg.faithful_negative_beta,
                            cfg.kl_warmup_steps)
    else:
        beta0 = cfg.beta
    loss = cfg.ce_x_weight * ce_x + beta0 * kld + l_r + l_n
    return loss, {"loss": loss, "CE_X": ce_x, "KLD": kld,
                  "l_r": l_r, "l_n": l_n}
