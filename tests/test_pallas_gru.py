"""Pallas fused stacked-GRU: forward AND gradient equivalence with the
lax.scan implementation (interpreter mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from music_fader_nets_tpu.ops import pallas_gru
from music_fader_nets_tpu.ops.gru import stacked_gru_scan


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run every pallas_call in this module through the interpreter.
    pallas_gru.INTERPRET both enables interpretation at its call sites and
    opens the CPU escape hatch in the stacked_gru_scan dispatch."""
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    monkeypatch.setattr(pallas_gru, "INTERPRET", True)
    yield


def _case(L=3, T=7, B=4, H=8, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    pre = jax.random.normal(ks[0], (L, T, B, 3 * H), dtype)
    w = jax.random.normal(ks[1], (L, H, 3 * H), dtype) * 0.3
    b = jax.random.normal(ks[2], (L, 3 * H), dtype) * 0.1
    h0 = jax.random.normal(ks[3], (L, B, H), dtype)
    return pre, w, b, h0


def test_forward_matches_scan():
    pre, w, b, h0 = _case()
    outs_ref, hf_ref = stacked_gru_scan(pre, w, b, h0)
    outs, hf = pallas_gru.stacked_gru_scan_pallas(pre, w, b, h0)
    np.testing.assert_allclose(outs, outs_ref, atol=1e-5)
    np.testing.assert_allclose(hf, hf_ref, atol=1e-5)


def test_gradients_match_scan():
    pre, w, b, h0 = _case()

    def loss_scan(pre, w, b, h0):
        outs, hf = stacked_gru_scan(pre, w, b, h0)
        return jnp.sum(outs * jnp.cos(outs)) + 2.0 * jnp.sum(hf ** 2)

    def loss_pal(pre, w, b, h0):
        outs, hf = pallas_gru.stacked_gru_scan_pallas(pre, w, b, h0)
        return jnp.sum(outs * jnp.cos(outs)) + 2.0 * jnp.sum(hf ** 2)

    g_ref = jax.grad(loss_scan, argnums=(0, 1, 2, 3))(pre, w, b, h0)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(pre, w, b, h0)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=1e-3)


def test_gradients_final_state_only():
    """Cotangent flowing only through h_final (the encoder use case)."""
    pre, w, b, h0 = _case(L=2, T=5, B=3, H=8, seed=1)

    def f(impl):
        def loss(pre, w, b, h0):
            _, hf = impl(pre, w, b, h0)
            return jnp.sum(jnp.tanh(hf))
        return jax.grad(loss, argnums=(0, 1, 2, 3))(pre, w, b, h0)

    g_ref = f(stacked_gru_scan)
    g_pal = f(pallas_gru.stacked_gru_scan_pallas)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(a, b_, atol=2e-4, rtol=1e-3)


def test_bf16_forward():
    pre, w, b, h0 = _case(dtype=jnp.bfloat16)
    outs_ref, _ = stacked_gru_scan(pre.astype(jnp.float32),
                                   w.astype(jnp.float32),
                                   b.astype(jnp.float32),
                                   h0.astype(jnp.float32))
    outs, _ = pallas_gru.stacked_gru_scan_pallas(pre, w, b, h0)
    # bf16 storage, f32 carry: close to the f32 reference
    np.testing.assert_allclose(outs.astype(jnp.float32), outs_ref,
                               atol=6e-2)


def test_dp_shard_map_matches_single_device():
    """The pure-dp shard_map wrapper: forward + grads equal the single-device
    kernel (which itself equals the scan) on an 8x1 mesh."""
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(8, 1)
    pre, w, b, h0 = _case(L=2, T=6, B=16, H=8, seed=2)

    def loss(impl):
        def f(pre, w, b, h0):
            h_seq = impl(pre, w, b, h0)
            return jnp.sum(h_seq * jnp.sin(h_seq)) + jnp.sum(h_seq[:, -1] ** 2)
        return f

    dp = lambda pre, w, b, h0: pallas_gru.stacked_gru_pallas_dp(
        pre, w, b, h0, mesh, mesh_lib.DATA_AXIS)
    single = lambda pre, w, b, h0: pallas_gru.stacked_gru_pallas(
        pre, w, b, h0)

    np.testing.assert_allclose(dp(pre, w, b, h0), single(pre, w, b, h0),
                               atol=1e-6)
    g_dp = jax.grad(loss(dp), argnums=(0, 1, 2, 3))(pre, w, b, h0)
    g_1 = jax.grad(loss(single), argnums=(0, 1, 2, 3))(pre, w, b, h0)
    for a, b_ in zip(g_dp, g_1):
        np.testing.assert_allclose(a, b_, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_trainer_dp_mesh_with_pallas_matches_single_device(monkeypatch):
    """--mesh 8x1 + use_pallas_gru: one train step equals the single-device
    XLA-scan trainer (the config.py promise that dp composes with the
    kernel). INTERPRET (set by the autouse fixture) opens the CPU path."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.data.datasets import YamahaDataset
    from music_fader_nets_tpu.data.synthetic import synth_corpus
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    from music_fader_nets_tpu.train import Trainer, vanilla_loss

    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, batch_size=16,
                           seq_len=24, attr_len=8)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, batch_size=16,
                          seq_len=24, attr_len=8, use_pallas_gru=True)
    arrays = YamahaDataset(*synth_corpus(32, 24, 8), mode="train").arrays()
    batch = {k: v[:16] for k, v in arrays.items()}

    ref = Trainer(cfg_scan, models.init_reg_vae,
                  {"default": vanilla_loss}, seed=5)
    mesh = mesh_lib.make_mesh(8, 1)
    dp = Trainer(cfg_pal, models.init_reg_vae,
                 {"default": vanilla_loss}, mesh=mesh, seed=5)

    rng = jax.random.PRNGKey(0)
    ref_state, ref_m = ref._train_steps["default"](ref.state, batch, rng)
    dp_state, dp_m = dp._train_steps["default"](
        dp.state, mesh_lib.shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(dp_m["loss"]), float(ref_m["loss"]),
                               rtol=2e-5)
    a = np.asarray(ref_state.params["gru_r"]["fwd"]["w_hh"])
    b_ = np.asarray(jax.device_get(dp_state.params["gru_r"]["fwd"]["w_hh"]))
    np.testing.assert_allclose(a, b_, atol=2e-5)


def test_model_forward_with_pallas_flag(monkeypatch):
    """cfg.use_pallas_gru routes every training recurrence through the
    kernel; outputs match the scan path (interpret mode, backend faked)."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models

    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                          use_pallas_gru=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(0)
    p = models.init_reg_gmvae(key, cfg_scan)
    B = 4
    x_oh = jax.nn.one_hot(jax.random.randint(key, (B, 12), 0, 342), 342)
    r_oh = jax.nn.one_hot(jax.random.randint(key, (B, 4), 0, 3), 3)
    n_oh = jax.nn.one_hot(jax.random.randint(key, (B, 4), 0, 16), 16)
    c = jax.random.uniform(key, (B, 24))

    a = models.reg_gmvae_forward(p, key, x_oh, r_oh, n_oh, c, cfg_scan)
    b = models.reg_gmvae_forward(p, key, x_oh, r_oh, n_oh, c, cfg_pal)
    for k in ("out", "r_out", "n_out", "mu_r", "std_n"):
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   atol=1e-4)
