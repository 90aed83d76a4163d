"""Reconstruction / token-accuracy report — the `evaluation_phase()` pass of
every reference trainer (reference trainer.py:280-376): CE terms, Pati
regularizers and per-sample token accuracy on a dataloader, with the
reference's trimming semantics for the event stream (trim the padded tail
of the target, compare the prediction prefix — trainer.py:329-349).

The per-sample Python accuracy loops of the reference are replaced by one
masked device computation per batch.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.losses.elbo import nll_mean
from music_fader_nets_tpu.losses.regularizers import pati_regularizer


def _masked_accuracy(logp: jax.Array, targets: jax.Array,
                     trim: bool) -> jax.Array:
    """Sum over batch of per-sample accuracy. trim=True keeps positions up
    to the target's last nonzero token (the reference's
    np.trim_zeros on a zero-padded tail)."""
    pred = jnp.argmax(logp, axis=-1)
    if trim:
        T = targets.shape[1]
        pos = jnp.arange(T)[None, :]
        nz = targets != 0
        last = jnp.max(jnp.where(nz, pos, -1), axis=1)       # (B,)
        mask = pos <= last[:, None]
    else:
        mask = jnp.ones_like(targets, dtype=bool)
    correct = jnp.where(mask, pred == targets, False)
    lens = jnp.maximum(mask.sum(axis=1), 1)
    return jnp.sum(correct.sum(axis=1) / lens)


def reconstruction_report(params, forward: Callable, arrays: Dict,
                          cfg: ModelConfig, batch_size: int = 128,
                          seed: int = 0,
                          has_subdecoders: bool = True) -> Dict[str, float]:
    """forward(params, rng, batch) -> dict with 'out' (+ 'r_out','n_out',
    'z_r','z_n' for disentangled models). Returns averaged CE / reg terms
    and token accuracies."""
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def batch_metrics(params, rng, batch):
        fwd = forward(params, rng, batch)
        out = {"CE_X": nll_mean(fwd["out"], batch["x"]),
               "acc_x_sum": _masked_accuracy(fwd["out"], batch["x"], True)}
        if has_subdecoders:
            out["CE_R"] = nll_mean(fwd["r_out"], batch["r"])
            out["CE_N"] = nll_mean(fwd["n_out"], batch["n"])
            out["acc_r_sum"] = _masked_accuracy(fwd["r_out"], batch["r"], False)
            out["acc_n_sum"] = _masked_accuracy(fwd["n_out"], batch["n"], False)
            out["l_r"] = pati_regularizer(fwd["z_r"][:, 0], batch["r_density"])
            out["l_n"] = pati_regularizer(fwd["z_n"][:, 0], batch["n_density"])
        if "qy_x_r" in fwd and "a" in batch:
            # GM-VAE supervised splits: arousal-classification accuracy of
            # the mixture posterior, argmax qy_x vs the binarized label
            # (reference trainer_gmm.py:570-578 — the headline signal that
            # the GMM components separate arousal classes). Reported as a
            # per-sample average; NB the reference divides its sum of
            # per-BATCH accuracy_score means by the sample count
            # (trainer_gmm.py:600-605), a normalization quirk we do not copy.
            y = batch["a"].astype(jnp.int32)
            out["acc_q_x_r_sum"] = jnp.sum(
                (jnp.argmax(fwd["qy_x_r"], axis=-1) == y).astype(jnp.float32))
            out["acc_q_x_n_sum"] = jnp.sum(
                (jnp.argmax(fwd["qy_x_n"], axis=-1) == y).astype(jnp.float32))
        return out

    totals: Dict[str, float] = {}
    n_batches, n_items = 0, 0
    n = len(arrays["x"])
    # the final partial batch is consumed too (reference DataLoader has
    # drop_last=False and averages per-batch means with equal weight,
    # trainer.py:280-376) — one extra compile for the tail shape
    for s in range(0, n, batch_size):
        batch = {k: v[s: s + batch_size] for k, v in arrays.items()}
        m = jax.device_get(batch_metrics(params, jax.random.fold_in(rng, s),
                                         batch))
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
        n_batches += 1
        n_items += len(batch["x"])

    if n_batches == 0:
        return {}
    report = {}
    for k, v in totals.items():
        if k.endswith("_sum"):
            report[k[:-4]] = v / n_items          # per-sample accuracy
        else:
            report[k] = v / n_batches
    return report
