"""Trainer integration: every objective runs a jitted step, gradients are
finite, loss decreases on the vanilla objective."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu import models
from music_fader_nets_tpu.data.datasets import VGMIDIDataset, YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus, synth_vgmidi
from music_fader_nets_tpu.train import (
    Trainer, cvae_loss, fader_loss, glsr_loss, gmm_loss, singlevae_loss,
    vanilla_loss,
)

CFG = ModelConfig(hidden_dims=32, z_dims=8, batch_size=8, seq_len=40,
                  attr_len=8, eval_decode_steps=20)


@pytest.fixture(scope="module")
def yamaha():
    return YamahaDataset(*synth_corpus(64, 40, 8), mode="train").arrays()


@pytest.fixture(scope="module")
def vgmidi():
    # get_vgmidi-style return order is (..., arousal, valence, chroma) while
    # the dataset takes (..., chroma, arousal, valence) — reorder as the
    # reference trainer does (trainer_gmm.py:85-87)
    data, rhythm, note, arousal, valence, chroma = synth_vgmidi(64, 40, 8)
    return VGMIDIDataset(data, rhythm, note, chroma, arousal, valence,
                         mode="train").arrays()


def test_vanilla_loss_decreases(yamaha):
    tr = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss})
    m1 = tr.run_epoch(yamaha, seed=1)
    for ep in range(2, 5):
        m_last = tr.run_epoch(yamaha, seed=ep)
    assert m_last["loss"] < m1["loss"]
    # 80% train split of 64 = 51 samples -> 6 full batches of 8, 4 epochs
    assert int(tr.state.step) == 24


@pytest.mark.parametrize("init_fn,loss_fn", [
    (models.init_reg_vae, glsr_loss),
    (models.init_cvae, cvae_loss),
    (models.init_fader, fader_loss),
    (models.init_single_vae, singlevae_loss),
])
def test_objectives_step(yamaha, init_fn, loss_fn):
    tr = Trainer(CFG, init_fn, {"default": loss_fn})
    metrics = tr.run_epoch(yamaha, seed=0)
    assert np.isfinite(metrics["loss"])


@pytest.mark.slow
def test_gmm_dual_corpus(yamaha, vgmidi):
    tr = Trainer(CFG, models.init_reg_gmvae, {
        "default": gmm_loss,
        "supervised": functools.partial(gmm_loss, is_supervised=True),
    })
    sup = tr.run_epoch(vgmidi, variant="supervised", seed=0)
    unsup = tr.run_epoch(yamaha, variant="default", seed=0)
    assert np.isfinite(sup["loss"]) and np.isfinite(unsup["loss"])
    assert sup["clf"] > 0.0           # supervised branch has the CE term
    assert unsup["kld_class"] != 0.0  # unsupervised branch has the class KL


@pytest.mark.slow
def test_gradients_finite(yamaha):
    tr = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss})
    batch = {k: v[:8] for k, v in yamaha.items()}

    def lossf(params):
        return vanilla_loss(params, jax.random.PRNGKey(0), batch,
                            jnp.asarray(0), CFG)[0]

    grads = jax.grad(lossf)(tr.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # unused-by-forward layers (parity-only) must get zero grads
    g_cr = np.asarray(grads["c_r"]["w"])
    assert np.allclose(g_cr, 0.0)


@pytest.mark.slow
def test_frozen_logvar_lookup_not_updated(yamaha):
    tr = Trainer(CFG, models.init_reg_gmvae, {"default": gmm_loss})
    before = np.asarray(tr.params["logvar_r_lookup"]).copy()
    tr.run_epoch(yamaha, seed=0)
    after = np.asarray(tr.params["logvar_r_lookup"])
    np.testing.assert_array_equal(before, after)


@pytest.mark.slow
def test_bfloat16_mixed_precision(yamaha):
    """bf16 compute path: loss finite, decreasing, master params stay f32."""
    import jax.numpy as jnp
    cfg16 = ModelConfig(hidden_dims=32, z_dims=8, batch_size=8, seq_len=40,
                        attr_len=8, dtype="bfloat16")
    tr = Trainer(cfg16, models.init_reg_vae, {"default": vanilla_loss})
    m1 = tr.run_epoch(yamaha, seed=1)
    m2 = tr.run_epoch(yamaha, seed=2)
    assert np.isfinite(m1["loss"]) and m2["loss"] < m1["loss"]
    assert tr.params["mu_r"]["w"].dtype == jnp.float32


def test_long_corpus_variant(  ):
    """The 'long' data type: 64-step attribute tracks, 250-token budget
    (reference ptb_v2.py:303)."""
    cfg = ModelConfig(hidden_dims=16, z_dims=4, batch_size=4, seq_len=250,
                      attr_len=64)
    data = synth_corpus(16, 250, 64)
    ds = YamahaDataset(*data, mode="train")
    tr = Trainer(cfg, models.init_reg_vae, {"default": vanilla_loss})
    m = tr.run_epoch(ds.arrays(), seed=0)
    assert np.isfinite(m["loss"])


def test_singlevae_kl_warmup_applies(yamaha):
    """--kl-warmup must not be a silent no-op for the SingleVAE family
    (whose reference schedule is constant raw beta): at step 0 of the
    warmup the effective KL weight is 0, i.e. the loss equals the beta=0
    loss; far past warmup it equals the raw-beta loss."""
    import dataclasses
    batch = {k: v[: CFG.batch_size] for k, v in yamaha.items()}
    rng = jax.random.PRNGKey(0)
    params = models.init_single_vae(jax.random.PRNGKey(1), CFG)

    def loss_at(cfg, step):
        l, _ = singlevae_loss(params, rng, batch, jnp.asarray(step), cfg)
        return float(l)

    warm = dataclasses.replace(CFG, kl_warmup_steps=800)
    beta0 = dataclasses.replace(CFG, beta=0.0)
    np.testing.assert_allclose(loss_at(warm, 0), loss_at(beta0, 0),
                               rtol=1e-6)
    np.testing.assert_allclose(loss_at(warm, 10_000), loss_at(CFG, 10_000),
                               rtol=1e-6)
    assert loss_at(warm, 0) != loss_at(CFG, 0)  # raw beta differs at step 0
