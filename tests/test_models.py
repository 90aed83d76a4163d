"""Model-level behavior tests: shapes, log-prob normalization, decoder
semantics (start token, teacher/greedy split, step-0 layer-2 init)."""
import jax
import jax.numpy as jnp
import numpy as np

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu import models
from music_fader_nets_tpu.models.modules import (
    global_decoder_greedy, global_decoder_init, global_decoder_teacher,
)
from music_fader_nets_tpu.ops.gru import gru_cell, linear_apply

CFG = ModelConfig(hidden_dims=48, z_dims=16, seq_len=24, attr_len=8)
KEY = jax.random.PRNGKey(42)


def _batch(B=4, T=24, A=8):
    k = jax.random.PRNGKey(7)
    return {
        "x_oh": jax.nn.one_hot(jax.random.randint(k, (B, T), 0, 342), 342),
        "r_oh": jax.nn.one_hot(jax.random.randint(k, (B, A), 0, 3), 3),
        "n_oh": jax.nn.one_hot(jax.random.randint(k, (B, A), 0, 16), 16),
        "c": jax.random.uniform(k, (B, 24)),
        "rd": jax.random.uniform(k, (B, 1)),
        "nd": jax.random.uniform(k, (B, 1)),
    }


def test_reg_vae_shapes_and_normalization():
    p = models.init_reg_vae(KEY, CFG)
    b = _batch()
    out = models.reg_vae_forward(p, KEY, b["x_oh"], b["r_oh"], b["n_oh"],
                                 b["c"], CFG)
    assert out["out"].shape == (4, 24, 342)
    assert out["r_out"].shape == (4, 8, 3)
    assert out["n_out"].shape == (4, 8, 16)
    # global decoder output is log-probs over the class axis
    np.testing.assert_allclose(np.exp(out["out"]).sum(-1), 1.0, atol=1e-4)
    # faithful sub-decoder quirk: normalized over TIME (axis=1)
    np.testing.assert_allclose(np.exp(out["r_out"]).sum(1), 1.0, atol=1e-4)


def test_subdecoder_softmax_axis_flag():
    cfg_fixed = ModelConfig(hidden_dims=48, z_dims=16,
                            faithful_subdecoder_softmax_axis=False)
    p = models.init_reg_vae(KEY, cfg_fixed)
    b = _batch()
    out = models.reg_vae_forward(p, KEY, b["x_oh"], b["r_oh"], b["n_oh"],
                                 b["c"], cfg_fixed)
    np.testing.assert_allclose(np.exp(out["r_out"]).sum(-1), 1.0, atol=1e-4)


def test_global_decoder_teacher_matches_stepwise_reference():
    """Replicates the reference decode loop (model_v2.py:118-143) step by
    step in plain Python and checks the scan implementation against it —
    including the start token at the LAST vocab index and the i==0 layer-2
    initialization."""
    V, Z, H, T, B = 20, 6, 10, 5, 3
    p = global_decoder_init(jax.random.PRNGKey(0), Z, V, H)
    k = jax.random.PRNGKey(1)
    z = jax.random.normal(k, (B, Z))
    x_oh = jax.nn.one_hot(jax.random.randint(k, (B, T), 0, V), V)

    got = global_decoder_teacher(p, z, x_oh)

    # eager reference loop
    out = jnp.zeros((B, V)).at[:, -1].set(1.0)
    h1 = linear_apply(p["linear_init_global"], z)
    h2 = None
    logps = []
    for i in range(T):
        inp = jnp.concatenate([out, z], axis=1)
        h1 = gru_cell(p["grucell_g"], inp, h1)
        if i == 0:
            h2 = h1
        h2 = gru_cell(p["grucell_g_2"], h1, h2)
        logp = jax.nn.log_softmax(linear_apply(p["linear_out_g"], h2), -1)
        logps.append(logp)
        out = x_oh[:, i]                                # teacher forcing
    ref = jnp.stack(logps, axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_global_decoder_greedy_matches_stepwise_reference():
    V, Z, H, B, steps = 20, 6, 10, 3, 7
    p = global_decoder_init(jax.random.PRNGKey(0), Z, V, H)
    # random init gives near-uniform logits, making argmax sensitive to
    # reduction-order noise; sharpen the head so the greedy path is stable
    p["linear_out_g"]["w"] = p["linear_out_g"]["w"] * 8.0
    z = jax.random.normal(jax.random.PRNGKey(1), (B, Z))

    got = global_decoder_greedy(p, z, steps)

    out = jnp.zeros((B, V)).at[:, -1].set(1.0)
    h1 = linear_apply(p["linear_init_global"], z)
    h2 = None
    logps = []
    for i in range(steps):
        inp = jnp.concatenate([out, z], axis=1)
        h1 = gru_cell(p["grucell_g"], inp, h1)
        if i == 0:
            h2 = h1
        h2 = gru_cell(p["grucell_g_2"], h1, h2)
        logp = jax.nn.log_softmax(linear_apply(p["linear_out_g"], h2), -1)
        logps.append(logp)
        out = jax.nn.one_hot(jnp.argmax(logp, -1), V)   # greedy feedback
    ref = jnp.stack(logps, axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gmvae_qy_x_matches_k_loop():
    """Vectorized approx_qy_x equals the reference's explicit K-loop
    (gmm_model.py:204-218)."""
    B, D, K = 5, 8, 3
    k = jax.random.PRNGKey(3)
    z = jax.random.normal(k, (B, D))
    mu = jax.random.normal(jax.random.PRNGKey(4), (K, D))
    logvar = jnp.full((K, D), -4.0)
    log_logit, qy = models.approx_qy_x(z, mu, logvar)

    ref = np.zeros((B, K))
    for ki in range(K):
        llh = -0.5 * ((np.asarray(z) - np.asarray(mu[ki])) ** 2
                      / np.exp(np.asarray(logvar[ki]))
                      + np.asarray(logvar[ki]) + np.log(2 * np.pi))
        ref[:, ki] = llh.sum(-1) + np.log(1.0 / K)
    np.testing.assert_allclose(log_logit, ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(qy).sum(-1), 1.0, atol=1e-5)


def test_all_families_forward():
    b = _batch()
    p = models.init_single_vae(KEY, CFG)
    o = models.single_vae_forward(p, KEY, b["x_oh"], b["c"], CFG)
    assert o["z"].shape == (4, 32)           # 2*z_dims capacity match

    p = models.init_cvae(KEY, CFG)
    o = models.cvae_forward(p, KEY, b["x_oh"], b["c"], b["rd"], b["nd"], CFG)
    assert o["z_full"].shape == (4, 18)      # z + 2 conditions

    p = models.init_fader(KEY, CFG)
    o = models.fader_forward(p, KEY, b["x_oh"], b["c"], b["rd"], b["nd"], CFG)
    assert o["disc_r"].shape == (4, 1)

    p = models.init_single_gmvae(KEY, CFG)
    o = models.single_gmvae_forward(p, KEY, b["x_oh"], CFG)
    assert o["qy_x"].shape == (4, CFG.num_clusters)


def test_greedy_decode_deterministic():
    p = models.init_reg_vae(KEY, CFG)
    z = jax.random.normal(KEY, (2, 2 * CFG.z_dims + CFG.chroma_dims))
    a = models.reg_vae_global_decode(p, z, 10)
    b = models.reg_vae_global_decode(p, z, 10)
    np.testing.assert_array_equal(np.argmax(a, -1), np.argmax(b, -1))


def test_encoder_stream_apply_matches_fused():
    """encoder_stream_apply is the readable single-stream spec that
    encode_streams_fused's docstring promises to match — pin it."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from music_fader_nets_tpu.models.modules import (
        encode_streams_fused, encoder_stream_apply, encoder_stream_init,
    )
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 4)
    views = [encoder_stream_init(ks[i], 13, 8, 6) for i in range(3)]
    x_oh = jax.nn.one_hot(jax.random.randint(ks[3], (4, 9), 0, 13), 13)
    fused = encode_streams_fused(views, x_oh)
    for v, (mu_f, std_f) in zip(views, fused):
        mu, std = encoder_stream_apply(v, x_oh)
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(std_f), np.asarray(std),
                                   atol=1e-5)
