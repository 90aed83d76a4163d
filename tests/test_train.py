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


def test_vgmidi_ragged_reference_semantics():
    """The released VGMIDI arrays are dtype=object arrays of variable-length
    per-song sequences; the reference re-inserts EOS before each token row's
    last element, zero-pads to the split max, and computes densities on the
    UNPADDED tracks (reference ptb_v2.py:459-473)."""
    from collections import Counter

    rng = np.random.default_rng(3)
    n_rows = 12
    d_rows = [rng.integers(2, 342, size=rng.integers(5, 20)).astype(np.int64)
              for _ in range(n_rows)]
    r_rows = [rng.integers(0, 3, size=rng.integers(4, 9)).astype(np.int64)
              for _ in range(n_rows)]
    n_rows_ = [rng.integers(0, 5, size=rng.integers(4, 9)).astype(np.int64)
               for _ in range(n_rows)]

    def obj(rows):
        out = np.empty(len(rows), dtype=object)
        for i, r in enumerate(rows):
            out[i] = r
        return out

    chroma = rng.random((n_rows, 24))
    arousal = rng.normal(0, 1, n_rows)
    valence = rng.normal(0, 1, n_rows)
    ds = VGMIDIDataset(obj(d_rows), obj(r_rows), obj(n_rows_), chroma,
                       arousal, valence, mode="train")
    tlen = int(0.9 * n_rows)
    assert len(ds) == tlen
    # EOS inserted at position -1 of each row, zero pad to split max
    max_t = max(len(r) for r in d_rows[:tlen]) + 1
    assert ds.data.shape == (tlen, max_t)
    for i, row in enumerate(d_rows[:tlen]):
        want = np.insert(row, -1, 1)
        np.testing.assert_array_equal(ds.data[i, : len(want)], want)
        assert (ds.data[i, len(want):] == 0).all()
    # densities computed on the UNPADDED tracks (Counter / sum semantics)
    for i in range(tlen):
        want_r = Counter(list(r_rows[i]))[1] / len(r_rows[i])
        want_n = sum(n_rows_[i]) / len(n_rows_[i])
        np.testing.assert_allclose(ds.r_density[i], want_r, rtol=1e-6)
        np.testing.assert_allclose(ds.n_density[i], want_n, rtol=1e-6)
    # rhythm/note padded to their own split maxes
    assert ds.rhythm.shape[1] == max(len(r) for r in r_rows[:tlen])
    assert ds.note.shape[1] == max(len(r) for r in n_rows_[:tlen])
    # arousal binarized at 0 (ptb_v2.py:472-473)
    np.testing.assert_array_equal(ds.arousal,
                                  (arousal[:tlen] >= 0).astype(np.int32))


def test_vgmidi_ragged_empty_row():
    """An empty token row in the ragged release becomes a lone EOS instead
    of crashing np.insert (we replicate reference behavior, not the
    IndexError its -1 index would raise there)."""
    def obj(rows):
        out = np.empty(len(rows), dtype=object)
        for i, r in enumerate(rows):
            out[i] = np.asarray(r, np.int64)
        return out

    d_rows = obj([[5, 6, 7], [], [9, 10]])
    tracks = obj([[1, 0], [1], [0, 2]])
    ones = np.ones(3)
    ds = VGMIDIDataset(d_rows, tracks, tracks, np.zeros((3, 24)),
                       ones, ones, mode="train")
    np.testing.assert_array_equal(ds.data[1], [1, 0, 0, 0])


def test_vgmidi_ragged_trains():
    """GM-VAE supervised epoch straight off the ragged released format."""
    from music_fader_nets_tpu.data.synthetic import synth_vgmidi_ragged

    data, rhythm, note, arousal, valence, chroma = synth_vgmidi_ragged(
        32, 60, 8, seed=5)
    assert data.dtype == object and len({len(r) for r in data}) > 1
    ds = VGMIDIDataset(data, rhythm, note, chroma, arousal, valence,
                       mode="train")
    tr = Trainer(CFG, models.init_reg_gmvae, {
        "supervised": functools.partial(gmm_loss, is_supervised=True)})
    m = tr.run_epoch(ds.arrays(), variant="supervised", seed=0, batch_size=8)
    assert np.isfinite(m["loss"]) and m["clf"] > 0.0


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
