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


def test_time_blocked_backward_multi_block():
    """T=20 picks a kt>1 time block (kt=2, 10 grid blocks): the batched
    dW/db accumulation and cross-block dh carry must match the scan."""
    lb, kt = pallas_gru._pick_bwd_blocks(2, 20, 4, 8, 24, 4)
    assert kt > 1
    pre, w, b, h0 = _case(L=2, T=20, B=4, H=8, seed=5)

    def loss(impl):
        def f(pre, w, b, h0):
            outs, hf = impl(pre, w, b, h0)
            return jnp.sum(outs * jnp.cos(outs)) + 2.0 * jnp.sum(hf ** 2)
        return f

    g_ref = jax.grad(loss(stacked_gru_scan), argnums=(0, 1, 2, 3))(
        pre, w, b, h0)
    g_pal = jax.grad(loss(pallas_gru.stacked_gru_scan_pallas),
                     argnums=(0, 1, 2, 3))(pre, w, b, h0)
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


# ---------------------------------------------------------------------------
# embedded-token kernel (one-hot encoder inputs; in-kernel dW_ih/db_ih)
# ---------------------------------------------------------------------------


def _embed_case(L=4, T=9, B=4, H=8, V=11, seed=3):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 + 4 * L)
    tok = jax.random.randint(ks[0], (B, T), 0, V)
    x_oh = jax.nn.one_hot(tok, V)
    params = []
    for i in range(L):
        k = ks[2 + 4 * i: 6 + 4 * i]
        params.append({
            "w_ih": jax.random.normal(k[0], (V, 3 * H)) * 0.3,
            "w_hh": jax.random.normal(k[1], (H, 3 * H)) * 0.3,
            "b_ih": jax.random.normal(k[2], (3 * H,)) * 0.1,
            "b_hh": jax.random.normal(k[3], (3 * H,)) * 0.1,
        })
    reverse = [bool(i % 2) for i in range(L)]
    return tok, x_oh, params, reverse


def test_embed_forward_matches_generic():
    from music_fader_nets_tpu.ops.gru import multi_gru_final_states
    tok, x_oh, params, reverse = _embed_case()
    ref = multi_gru_final_states(params, x_oh, reverse, use_pallas=False)
    got = multi_gru_final_states(params, x_oh, reverse, use_pallas=True,
                                 tokens=tok)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_embed_gradients_match_generic():
    from music_fader_nets_tpu.ops.gru import multi_gru_final_states
    tok, x_oh, params, reverse = _embed_case(L=2, T=6, B=3, H=8, seed=4)

    def loss(params, use_pallas):
        hf = multi_gru_final_states(params, x_oh, reverse,
                                    use_pallas=use_pallas,
                                    tokens=tok if use_pallas else None)
        return jnp.sum(hf * jnp.cos(hf))

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3,
                                   err_msg=str(path))


def test_embed_dp_matches_single_device():
    from music_fader_nets_tpu.ops.gru import multi_gru_final_states
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    tok, x_oh, params, reverse = _embed_case(L=2, T=5, B=16, H=8, seed=5)
    mesh = mesh_lib.make_mesh(8, 1)

    def loss(params, tokens, in_mesh):
        def f(p):
            ctx = mesh_lib.trace_mesh_scope(in_mesh)
            with ctx:
                hf = multi_gru_final_states(p, x_oh, reverse,
                                            use_pallas=True, tokens=tokens)
            return jnp.sum(jnp.tanh(hf))
        return f

    v1 = loss(params, tok, None)(params)
    v8 = loss(params, tok, mesh)(params)
    np.testing.assert_allclose(v8, v1, atol=1e-6)
    g1 = jax.grad(loss(params, tok, None))(params)
    g8 = jax.grad(loss(params, tok, mesh))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4)


def test_model_forward_with_tokens_matches(monkeypatch):
    """reg_gmvae_forward(tokens=...) — the embedded-encoder training path —
    equals the plain one-hot path."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models

    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                          use_pallas_gru=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(0)
    p = models.init_reg_gmvae(key, cfg_scan)
    B = 4
    tok = jax.random.randint(key, (B, 12), 0, 342)
    x_oh = jax.nn.one_hot(tok, 342)
    r_oh = jax.nn.one_hot(jax.random.randint(key, (B, 4), 0, 3), 3)
    n_oh = jax.nn.one_hot(jax.random.randint(key, (B, 4), 0, 16), 16)
    c = jax.random.uniform(key, (B, 24))

    a = models.reg_gmvae_forward(p, key, x_oh, r_oh, n_oh, c, cfg_scan)
    b = models.reg_gmvae_forward(p, key, x_oh, r_oh, n_oh, c, cfg_pal,
                                 tokens=tok)
    for k in ("out", "r_out", "n_out", "mu_r", "std_n"):
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# fused 2-layer teacher decoder
# ---------------------------------------------------------------------------


def _dec_case(B=4, T=9, H=8, V=11, Z=6, seed=7):
    from music_fader_nets_tpu.models.modules import global_decoder_init
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 3)
    p = global_decoder_init(ks[0], Z, V, H)
    z = jax.random.normal(ks[1], (B, Z))
    tok = jax.random.randint(ks[2], (B, T), 0, V)
    x_oh = jax.nn.one_hot(tok, V)
    return p, z, tok, x_oh


def test_fused_decoder_matches_scan():
    from music_fader_nets_tpu.models.modules import global_decoder_teacher
    p, z, tok, x_oh = _dec_case()
    ref = global_decoder_teacher(p, z, x_oh, use_pallas=False)
    got = global_decoder_teacher(p, z, x_oh, use_pallas=True, tokens=tok)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_decoder_gradients_match_scan():
    from music_fader_nets_tpu.models.modules import global_decoder_teacher
    p, z, tok, x_oh = _dec_case(B=3, T=7, seed=8)
    tgt = jax.random.normal(jax.random.PRNGKey(9),
                            (3, 7, 11))

    def loss(p, z, use_pallas):
        out = global_decoder_teacher(p, z, x_oh, use_pallas=use_pallas,
                                     tokens=tok if use_pallas else None)
        return jnp.sum(out * tgt)

    g_ref = jax.grad(lambda p, z: loss(p, z, False), argnums=(0, 1))(p, z)
    g_pal = jax.grad(lambda p, z: loss(p, z, True), argnums=(0, 1))(p, z)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3,
                                   err_msg=str(path))


def test_fused_decoder_dp_matches_single():
    from music_fader_nets_tpu.models.modules import global_decoder_teacher
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    p, z, tok, x_oh = _dec_case(B=16, T=6, seed=10)
    mesh = mesh_lib.make_mesh(8, 1)

    def loss(in_mesh):
        def f(p, z):
            with mesh_lib.trace_mesh_scope(in_mesh):
                out = global_decoder_teacher(p, z, x_oh, use_pallas=True,
                                             tokens=tok)
            return jnp.sum(jnp.tanh(out))
        return f

    v1 = loss(None)(p, z)
    v8 = loss(mesh)(p, z)
    np.testing.assert_allclose(v8, v1, atol=1e-6)
    g1 = jax.grad(loss(None), argnums=(0, 1))(p, z)
    g8 = jax.grad(loss(mesh), argnums=(0, 1))(p, z)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4)


def test_fused_ce_dp_matches_single():
    """CE-fused NLL kernel over a pure-dp mesh (_dec_nll_core_dp): value and
    parameter/z gradients equal the single-device fused kernel and the scan
    fallback."""
    from music_fader_nets_tpu.models.modules import global_decoder_teacher_nll
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    p, z, tok, x_oh = _dec_case(B=16, T=6, seed=11)
    mesh = mesh_lib.make_mesh(8, 1)

    def loss(in_mesh, use_pallas=True):
        def f(p, z):
            with mesh_lib.trace_mesh_scope(in_mesh):
                nll = global_decoder_teacher_nll(p, z, x_oh, tok, tok,
                                                 use_pallas=use_pallas)
            return jnp.mean(nll)
        return f

    v_scan = loss(None, use_pallas=False)(p, z)
    v1 = loss(None)(p, z)
    v8 = loss(mesh)(p, z)
    np.testing.assert_allclose(v1, v_scan, rtol=1e-5)
    np.testing.assert_allclose(v8, v1, atol=1e-6)
    g1 = jax.grad(loss(None), argnums=(0, 1))(p, z)
    g8 = jax.grad(loss(mesh), argnums=(0, 1))(p, z)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4)


def test_fused_ce_loss_and_grads_match(monkeypatch):
    """gmm_loss with the fused decode+CE kernel (nll_x path) equals the
    scan path in value AND parameter gradients."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.train.objectives import gmm_loss

    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                          use_pallas_gru=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(3)
    p = models.init_reg_gmvae(key, cfg_scan)
    B = 4
    ks = jax.random.split(key, 6)
    batch = {
        "x": jax.random.randint(ks[0], (B, 12), 0, 342),
        "r": jax.random.randint(ks[1], (B, 4), 0, 3),
        "n": jax.random.randint(ks[2], (B, 4), 0, 16),
        "c": jax.random.uniform(ks[3], (B, 24)),
        "r_density": jax.random.uniform(ks[4], (B,)),
        "n_density": jax.random.uniform(ks[5], (B,)),
    }
    step = jnp.asarray(0, jnp.int32)

    def loss(p, cfg):
        return gmm_loss(p, key, batch, step, cfg)[0]

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, cfg_scan))(p)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss(p, cfg_pal))(p)
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=3e-4, rtol=2e-3,
                                   err_msg=str(path))


@pytest.mark.parametrize("L,T,B,H,V", [
    (1, 1, 2, 8, 5),      # degenerate: single layer, single step
    (1, 7, 3, 8, 11),     # single layer
    (6, 3, 2, 8, 7),      # L with several divisors, short T
    (2, 5, 8, 16, 130),   # V > 128 (pads to 256)
    (2, 20, 4, 8, 11),    # T=20: kt>1 time-blocked backward, 2 grid blocks
])
def test_embed_edge_shapes(L, T, B, H, V):
    from music_fader_nets_tpu.ops.gru import multi_gru_final_states
    ks = jax.random.split(jax.random.PRNGKey(L * 100 + T), 2 + 4 * L)
    tok = jax.random.randint(ks[0], (B, T), 0, V)
    x_oh = jax.nn.one_hot(tok, V)
    params = [{
        "w_ih": jax.random.normal(ks[2 + 4 * i], (V, 3 * H)) * 0.3,
        "w_hh": jax.random.normal(ks[3 + 4 * i], (H, 3 * H)) * 0.3,
        "b_ih": jax.random.normal(ks[4 + 4 * i], (3 * H,)) * 0.1,
        "b_hh": jax.random.normal(ks[5 + 4 * i], (3 * H,)) * 0.1,
    } for i in range(L)]
    reverse = [bool(i % 2) for i in range(L)]

    def loss(p, pal):
        hf = multi_gru_final_states(p, x_oh, reverse, use_pallas=pal,
                                    tokens=tok if pal else None)
        return jnp.sum(hf * jnp.cos(hf))

    np.testing.assert_allclose(loss(params, True), loss(params, False),
                               atol=1e-5)
    g_r = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_r),
                     jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("T,B", [(1, 2), (2, 1), (5, 8)])
def test_fused_decoder_edge_shapes(T, B):
    from music_fader_nets_tpu.models.modules import global_decoder_teacher
    p, z, tok, x_oh = _dec_case(B=B, T=T, seed=T * 10 + B)
    ref = global_decoder_teacher(p, z, x_oh, use_pallas=False)
    got = global_decoder_teacher(p, z, x_oh, use_pallas=True, tokens=tok)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_nll_path_activates(monkeypatch):
    """The training objectives must actually reach the CE-fused kernel on
    the single-device path (a silent fallback to decode+gather would be
    numerically identical but ~7% slower — catch the regression here)."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.ops import pallas_gru
    from music_fader_nets_tpu.train.objectives import gmm_loss

    calls = []
    orig = pallas_gru.decoder_teacher_fused_nll
    monkeypatch.setattr(pallas_gru, "decoder_teacher_fused_nll",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    cfg = ModelConfig(hidden_dims=16, z_dims=8, seq_len=10, attr_len=4,
                      use_pallas_gru=True)
    key = jax.random.PRNGKey(0)
    p = models.init_reg_gmvae(key, cfg)
    ks = jax.random.split(key, 6)
    batch = {
        "x": jax.random.randint(ks[0], (4, 10), 0, 342),
        "r": jax.random.randint(ks[1], (4, 4), 0, 3),
        "n": jax.random.randint(ks[2], (4, 4), 0, 16),
        "c": jax.random.uniform(ks[3], (4, 24)),
        "r_density": jax.random.uniform(ks[4], (4,)),
        "n_density": jax.random.uniform(ks[5], (4,)),
    }
    loss, _ = gmm_loss(p, key, batch, jnp.asarray(0), cfg)
    assert calls, "gmm_loss did not reach decoder_teacher_fused_nll"
    assert np.isfinite(float(loss))


# ---------------------------------------------------------------------------
# masked-mass fused decoder (GLSR path)
# ---------------------------------------------------------------------------

_RANGES = ((2, 5), (6, 9))        # toy vocab (V=11) stand-ins for the GLSR
                                  # note-on / time-separator ranges


def test_fused_masses_match_scan():
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher_masses)
    p, z, tok, x_oh = _dec_case(seed=12)
    ref = global_decoder_teacher_masses(p, z, x_oh, None, _RANGES,
                                        use_pallas=False)
    got = global_decoder_teacher_masses(p, z, x_oh, tok, _RANGES,
                                        use_pallas=True)
    assert len(got) == 2 and got[0].shape == ref[0].shape
    for a, b_ in zip(got, ref):
        np.testing.assert_allclose(a, b_, atol=1e-6)


def test_fused_masses_gradients_match_scan():
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher_masses)
    p, z, tok, x_oh = _dec_case(B=3, T=8, seed=13)
    w_pl = jax.random.normal(jax.random.PRNGKey(14), (3, 8))
    w_sp = jax.random.normal(jax.random.PRNGKey(15), (3, 8))

    def loss(p, z, use_pallas):
        played, sep = global_decoder_teacher_masses(
            p, z, x_oh, tok if use_pallas else None, _RANGES,
            use_pallas=use_pallas)
        return jnp.sum(played * w_pl) + jnp.sum(jnp.tanh(sep) * w_sp)

    g_ref = jax.grad(lambda p, z: loss(p, z, False), argnums=(0, 1))(p, z)
    g_pal = jax.grad(lambda p, z: loss(p, z, True), argnums=(0, 1))(p, z)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3,
                                   err_msg=str(path))


def test_fused_masses_dp_matches_single():
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher_masses)
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    p, z, tok, x_oh = _dec_case(B=16, T=6, seed=16)
    mesh = mesh_lib.make_mesh(8, 1)

    def loss(in_mesh):
        def f(p, z):
            with mesh_lib.trace_mesh_scope(in_mesh):
                played, sep = global_decoder_teacher_masses(
                    p, z, x_oh, tok, _RANGES, use_pallas=True)
            return jnp.sum(played ** 2) + jnp.sum(sep)
        return f

    v1 = loss(None)(p, z)
    v8 = loss(mesh)(p, z)
    np.testing.assert_allclose(v8, v1, atol=1e-6)
    g1 = jax.grad(loss(None), argnums=(0, 1))(p, z)
    g8 = jax.grad(loss(mesh), argnums=(0, 1))(p, z)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4)


def test_glsr_loss_and_grads_match(monkeypatch):
    """glsr_loss with the masked-mass fused decoder equals the scan path in
    value AND parameter gradients (the GLSR perturbation decodes are the
    consumers of decoder_teacher_fused_masses)."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.ops import pallas_gru
    from music_fader_nets_tpu.train.objectives import glsr_loss

    calls = []
    orig = pallas_gru.decoder_teacher_fused_masses
    monkeypatch.setattr(pallas_gru, "decoder_teacher_fused_masses",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                          use_pallas_gru=True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    key = jax.random.PRNGKey(5)
    p = models.init_reg_vae(key, cfg_scan)
    B = 4
    ks = jax.random.split(key, 6)
    batch = {
        "x": jax.random.randint(ks[0], (B, 12), 0, 342),
        "r": jax.random.randint(ks[1], (B, 4), 0, 3),
        "n": jax.random.randint(ks[2], (B, 4), 0, 16),
        "c": jax.random.uniform(ks[3], (B, 24)),
        "r_density": jax.random.uniform(ks[4], (B,)),
        "n_density": jax.random.uniform(ks[5], (B,)),
    }
    step = jnp.asarray(100, jnp.int32)      # past the step>20 GLSR gate

    def loss(p, cfg):
        return glsr_loss(p, key, batch, step, cfg)[0]

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(p, cfg_scan))(p)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss(p, cfg_pal))(p)
    assert calls, "glsr_loss did not reach decoder_teacher_fused_masses"
    np.testing.assert_allclose(l_pal, l_ref, rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=3e-4, rtol=2e-3,
                                   err_msg=str(path))


def test_fused_masses_shared_tokens_n_rep():
    """n_rep>1 (GLSR's 4 z-perturbations over one sequence batch): the
    shared-token kernel path equals tiling the tokens explicitly, in value
    AND gradients (incl. the folded dW_tok accumulation)."""
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher_masses)
    p, z0, tok, x_oh = _dec_case(B=3, T=8, seed=17)
    z = jnp.concatenate([z0, z0 * 0.5 + 0.1, -z0, z0 + 0.3], axis=0)
    tok4 = jnp.tile(tok, (4, 1))
    x4 = jnp.tile(x_oh, (4, 1, 1))
    w = jax.random.normal(jax.random.PRNGKey(18), (12, 8))

    def loss(p, z, n_rep):
        if n_rep == 1:
            played, sep = global_decoder_teacher_masses(
                p, z, x4, tok4, _RANGES, use_pallas=True)
        else:
            played, sep = global_decoder_teacher_masses(
                p, z, x_oh, tok, _RANGES, use_pallas=True, n_rep=n_rep)
        return jnp.sum(played * w) + jnp.sum(sep ** 2)

    v1 = loss(p, z, 1)
    v4 = loss(p, z, 4)
    np.testing.assert_allclose(v4, v1, atol=1e-6)
    g1 = jax.grad(loss, argnums=(0, 1))(p, z, 1)
    g4 = jax.grad(loss, argnums=(0, 1))(p, z, 4)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    flat4, _ = jax.tree_util.tree_flatten_with_path(g4)
    for (path, a), (_, b_) in zip(flat1, flat4):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4,
                                   err_msg=str(path))


# ---------------------------------------------------------------------------
# class-embedded full-sequence kernel (sub-decoder use case)
# ---------------------------------------------------------------------------


def _embed_seq_case(L=2, T=8, B=4, H=8, Cp=128, seed=21):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    G = 3 * H
    cls = jax.random.randint(ks[0], (L, T, B), 0, 16)
    w_emb = jnp.zeros((L, Cp, G)).at[:, :16].set(
        jax.random.normal(ks[1], (L, 16, G)) * 0.3)
    prez = jax.random.normal(ks[2], (L, B, G)) * 0.3
    w_hh = jax.random.normal(ks[3], (L, H, G)) * 0.3
    b_hh = jax.random.normal(ks[4], (L, G)) * 0.1
    h0 = jax.random.normal(ks[0], (L, B, H))
    return cls, w_emb, prez, w_hh, b_hh, h0


def _embed_seq_ref(cls, w_emb, prez, w_hh, b_hh, h0):
    oh = jax.nn.one_hot(cls, w_emb.shape[1], dtype=w_emb.dtype)
    pre = jnp.einsum("ltbc,lcg->ltbg", oh, w_emb) + prez[:, None]
    outs, _ = stacked_gru_scan(pre, w_hh, b_hh, h0)
    return outs


def test_embed_seq_forward_matches_generic():
    args = _embed_seq_case()
    ref = _embed_seq_ref(*args)
    got = pallas_gru.stacked_gru_embed_seq(*args)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("T", [1, 5, 8, 16])
def test_embed_seq_gradients_match_generic(T):
    args = _embed_seq_case(T=T)

    def loss(fn):
        def f(*a):
            out = fn(*a)
            return jnp.sum(out * jnp.cos(out))
        return f

    g_ref = jax.grad(loss(_embed_seq_ref), argnums=(1, 2, 3, 4, 5))(*args)
    g_pal = jax.grad(loss(pallas_gru.stacked_gru_embed_seq),
                     argnums=(1, 2, 3, 4, 5))(*args)
    for name, a, b_ in zip(("w_emb", "prez", "w_hh", "b_hh", "h0"),
                           g_ref, g_pal):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3,
                                   err_msg=name)


def test_embed_seq_dp_matches_single_device():
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    args = _embed_seq_case(B=16, seed=23)
    mesh = mesh_lib.make_mesh(8, 1)

    def loss(in_mesh):
        def f(w_emb, prez, w_hh, b_hh, h0):
            if in_mesh is None:
                out = pallas_gru.stacked_gru_embed_seq(
                    args[0], w_emb, prez, w_hh, b_hh, h0)
            else:
                out = pallas_gru.stacked_gru_embed_seq_dp(
                    args[0], w_emb, prez, w_hh, b_hh, h0, in_mesh)
            return jnp.sum(jnp.tanh(out))
        return f

    v1 = loss(None)(*args[1:])
    v8 = loss(mesh)(*args[1:])
    np.testing.assert_allclose(v8, v1, atol=1e-4)  # shard-reduction order
    g1 = jax.grad(loss(None), argnums=(0, 1, 2, 3, 4))(*args[1:])
    g8 = jax.grad(loss(mesh), argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b_ in zip(g1, g8):
        np.testing.assert_allclose(b_, a, atol=2e-5, rtol=1e-4)


def test_sub_pair_packed_track_ids_matches(monkeypatch):
    """The fast-layout sub-decoder pair with track_ids (class-embedded
    kernel) equals the generic packed einsum path, value and grads."""
    from music_fader_nets_tpu.models.modules import (
        sub_decoder_pair_apply_packed)
    from music_fader_nets_tpu.models import fast as fast_lib
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    p = models.init_reg_vae(jax.random.PRNGKey(0), cfg)
    fp, _ = fast_lib.split_fast(p)
    B = 4
    key = jax.random.PRNGKey(1)
    r_ids = jax.random.randint(key, (B, 4), 0, 3)
    n_ids = jax.random.randint(key, (B, 4), 0, 16)
    r_oh = jax.nn.one_hot(r_ids, 3)
    n_oh = jax.nn.one_hot(n_ids, 16)
    z_r = jax.random.normal(key, (B, 8))
    z_n = jax.random.normal(jax.random.PRNGKey(2), (B, 8))

    def loss(fp, use_kernel):
        r_out, n_out = sub_decoder_pair_apply_packed(
            fp["sub_rn"], fp["linear_init_r"], fp["linear_init_n"],
            fp["linear_out_r"], fp["linear_out_n"],
            r_oh, n_oh, z_r, z_n, True,
            use_pallas=use_kernel,
            track_ids=(r_ids, n_ids) if use_kernel else None)
        return jnp.sum(r_out * jnp.cos(r_out)) + jnp.sum(n_out ** 2)

    v_ref = loss(fp, False)
    v_pal = loss(fp, True)
    np.testing.assert_allclose(v_pal, v_ref, atol=1e-4)
    g_ref = jax.grad(lambda q: loss(q, False))(fp)
    g_pal = jax.grad(lambda q: loss(q, True))(fp)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b_) in zip(flat_r, flat_p):
        np.testing.assert_allclose(b_, a, atol=2e-4, rtol=1e-3,
                                   err_msg=str(path))


def test_sub_pair_packed_wide_class_dims_fall_back(monkeypatch):
    """Class dims wider than the kernel's 128-lane embedding pad must take
    the generic packed-einsum branch (a negative jnp.pad raised at trace
    time before the dm<=Cp guard), and still match the no-kernel path."""
    from music_fader_nets_tpu.models.modules import (
        sub_decoder_pair_apply_packed)
    from music_fader_nets_tpu.models import fast as fast_lib
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                      note_dims=200)
    p = models.init_reg_vae(jax.random.PRNGKey(0), cfg)
    fp, _ = fast_lib.split_fast(p)
    B = 4
    key = jax.random.PRNGKey(1)
    r_ids = jax.random.randint(key, (B, 4), 0, 3)
    n_ids = jax.random.randint(key, (B, 4), 0, 200)
    z_r = jax.random.normal(key, (B, 8))
    z_n = jax.random.normal(jax.random.PRNGKey(2), (B, 8))

    def run(use_kernel):
        return sub_decoder_pair_apply_packed(
            fp["sub_rn"], fp["linear_init_r"], fp["linear_init_n"],
            fp["linear_out_r"], fp["linear_out_n"],
            jax.nn.one_hot(r_ids, 3), jax.nn.one_hot(n_ids, 200),
            z_r, z_n, True, use_pallas=use_kernel,
            track_ids=(r_ids, n_ids) if use_kernel else None)

    for a, b_ in zip(run(True), run(False)):
        np.testing.assert_allclose(a, b_, atol=1e-5)


def test_train_kernel_fallback_telemetry_and_warning(monkeypatch):
    """A requested-but-inapplicable training kernel is never silent
    (round-4 VERDICT weak #4): under a tp mesh `kernel_dispatch` warns once
    and records the scan reason in LAST_TRAIN_PATH; applicable dispatches
    record the kernel kind."""
    from music_fader_nets_tpu.parallel import mesh as mesh_lib

    monkeypatch.setattr(pallas_gru, "INTERPRET", True)
    monkeypatch.setattr(pallas_gru, "_warned_train_fallback", False)
    pallas_gru.LAST_TRAIN_PATH = None      # reset (worst-path-wins latch)

    # bare backend (no trace mesh): kernel applies
    kind, _ = pallas_gru.kernel_dispatch(8)
    assert kind == "single"
    assert pallas_gru.LAST_TRAIN_PATH == "kernel-single"

    # pure-dp mesh, divisible batch: dp kernel applies
    mesh_dp = mesh_lib.make_mesh(8, 1)
    with mesh_lib.trace_mesh_scope(mesh_dp):
        kind, m = pallas_gru.kernel_dispatch(16)
    assert kind == "dp" and m is mesh_dp
    assert pallas_gru.LAST_TRAIN_PATH == "kernel-dp"

    # tp mesh: fallback, warns ONCE
    mesh_tp = mesh_lib.make_mesh(4, 2)
    with mesh_lib.trace_mesh_scope(mesh_tp):
        with pytest.warns(RuntimeWarning, match="inapplicable"):
            kind, _ = pallas_gru.kernel_dispatch(16)
        assert kind is None
        assert pallas_gru.LAST_TRAIN_PATH == "scan-tp-mesh"
        # second consult is quiet but still recorded
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            assert pallas_gru.kernel_dispatch(16)[0] is None
        assert pallas_gru.LAST_TRAIN_PATH == "scan-tp-mesh"

    # pure-dp mesh but indivisible per-process batch
    monkeypatch.setattr(pallas_gru, "_warned_train_fallback", False)
    with mesh_lib.trace_mesh_scope(mesh_dp):
        with pytest.warns(RuntimeWarning, match="indivisible"):
            kind, _ = pallas_gru.kernel_dispatch(12)     # 12 % 8 != 0
    assert kind is None
    assert pallas_gru.LAST_TRAIN_PATH == "scan-indivisible-batch"

    # CPU without interpret: quiet scan (the documented dev/test config)
    monkeypatch.setattr(pallas_gru, "INTERPRET", False)
    monkeypatch.setattr(pallas_gru, "_warned_train_fallback", False)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert pallas_gru.kernel_dispatch(8)[0] is None
    assert pallas_gru.LAST_TRAIN_PATH == "scan-cpu"

    # worst-path-wins: a later kernel-applicable consult (e.g. GLSR's
    # 4B-row masses decode, whose batch divides a dp mesh that the B-row
    # encoder consult did not) must NOT mask an earlier scan fallback
    monkeypatch.setattr(pallas_gru, "INTERPRET", True)
    monkeypatch.setattr(pallas_gru, "_warned_train_fallback", False)
    pallas_gru.LAST_TRAIN_PATH = None
    with mesh_lib.trace_mesh_scope(mesh_dp):
        with pytest.warns(RuntimeWarning, match="indivisible"):
            assert pallas_gru.kernel_dispatch(12)[0] is None    # B=12
        assert pallas_gru.kernel_dispatch(48)[0] == "dp"        # 4B=48
    assert pallas_gru.LAST_TRAIN_PATH == "scan-indivisible-batch"
    # ...until an explicit reset
    pallas_gru.LAST_TRAIN_PATH = None
    with mesh_lib.trace_mesh_scope(mesh_dp):
        assert pallas_gru.kernel_dispatch(48)[0] == "dp"
    assert pallas_gru.LAST_TRAIN_PATH == "kernel-dp"


def test_cvae_encoder_takes_kernel_path(monkeypatch):
    """The CVAE encoder threads use_pallas through to the generic stacked
    kernel (round-4 VERDICT weak #1): under --pallas-gru its input is
    [one-hot + 2 conditions] so the token kernel rightly does not apply,
    but the generic kernel must — and outputs must match the scan."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models

    cfg_scan = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4)
    cfg_pal = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                          use_pallas_gru=True)

    key = jax.random.PRNGKey(0)
    p = models.init_cvae(key, cfg_scan)
    B = 4
    x_oh = jax.nn.one_hot(jax.random.randint(key, (B, 12), 0, 342), 342)
    c = jax.random.uniform(key, (B, 24))
    rd = jax.random.uniform(key, (B, 1))
    nd = jax.random.uniform(key, (B, 1))

    a = models.cvae_forward(p, key, x_oh, c, rd, nd, cfg_scan)
    pallas_gru.LAST_TRAIN_PATH = None
    b = models.cvae_forward(p, key, x_oh, c, rd, nd, cfg_pal)
    # the encoder consulted the dispatch and got the kernel
    assert pallas_gru.LAST_TRAIN_PATH == "kernel-single"
    for k in ("out", "mu", "std"):
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]),
                                   atol=1e-4)

    # direct encoder check too (eval callers use cvae_encode standalone)
    mu_s, std_s = models.cvae_encode(p, x_oh, rd, nd)
    mu_k, std_k = models.cvae_encode(p, x_oh, rd, nd, use_pallas=True)
    np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(std_k), np.asarray(std_s),
                               atol=1e-5)
