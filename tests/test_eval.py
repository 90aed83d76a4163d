"""Controllability / reconstruction / transfer harness tests (tiny dims)."""

import jax
import numpy as np
import pytest

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu import models
from music_fader_nets_tpu.data.datasets import YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus
from music_fader_nets_tpu.eval.controllability import (
    ControllabilityEvaluator, clean_output, get_classes, latent_stats, _r2,
)
from music_fader_nets_tpu.eval.reconstruction import reconstruction_report
from music_fader_nets_tpu.ops.sampling import reparameterize
from music_fader_nets_tpu.transfer.arousal import (
    arousal_transfer, compute_shift_vectors, transfer_to_midi,
)

CFG = ModelConfig(hidden_dims=32, z_dims=8, batch_size=8, seq_len=60,
                  attr_len=8, eval_decode_steps=40)


@pytest.fixture(scope="module")
def arrays():
    return YamahaDataset(*synth_corpus(96, 60, 8), mode="train").arrays()


def test_clean_output():
    toks = np.array([0, 0, 5, 7, 9, 1, 3, 0, 0])
    out = clean_output(toks)
    np.testing.assert_array_equal(out, [5, 7, 9])
    # no EOS: just trims zeros
    np.testing.assert_array_equal(clean_output(np.array([0, 4, 6, 0])), [4, 6])


def test_get_classes():
    r = [1, 1, 0, 2, 2, 0, 0, 0]
    n = [4, 4, 0, 0, 0, 0, 0, 0]
    rd, nd, cr, cn = get_classes(r, n)
    assert abs(rd - 0.25) < 1e-9 and cr == 0
    assert abs(nd - 1.0) < 1e-9 and cn == 0


def test_r2_matches_linregress():
    x = np.array([0., 1, 2, 3, 4, 5, 6, 7])
    y = 2 * x + 1 + np.array([0.1, -0.2, 0.05, 0, 0.3, -0.1, 0.2, 0])
    from sklearn.linear_model import LinearRegression
    reg = LinearRegression().fit(x[:, None], y[:, None])
    assert abs(_r2(x, y) - reg.score(x[:, None], y[:, None])) < 1e-9


def test_r2_constant_target_matches_sklearn():
    """Constant target: LinearRegression fits slope 0 / intercept mean, so
    residuals are 0 and .score returns 1.0 — our _r2 must agree
    (reference test_class.py:268-272 uses .score directly)."""
    from sklearn.linear_model import LinearRegression
    x = np.array([0., 1, 2, 3])
    y = np.full(4, 2.5)
    reg = LinearRegression().fit(x[:, None], y[:, None])
    want = reg.score(x[:, None], y[:, None])
    assert _r2(x, y) == want == 1.0


def test_reconstruction_report_qyx_accuracy():
    """Pin the GM-VAE supervised-split arousal-classification accuracy
    (argmax qy_x vs label, reference trainer_gmm.py:570-578) on a stubbed
    forward with hand-computed posteriors."""
    import jax.numpy as jnp

    B, T = 4, 6
    arrays = {
        "x": np.tile(np.arange(1, T + 1), (2 * B, 1)).astype(np.int32),
        "a": np.array([0, 1, 1, 0] * 2, np.int32),
    }
    # qy_x argmax per row: [0, 1, 0, 0] vs labels [0, 1, 1, 0] -> 3/4
    qy = jnp.asarray(np.array([[0.9, 0.1], [0.2, 0.8],
                               [0.7, 0.3], [0.6, 0.4]], np.float32))

    def forward(params, rng, batch):
        # perfect token predictions so acc_x pins to 1.0 alongside
        logp = jnp.log(jax.nn.one_hot(batch["x"], 8) * 0.999 + 1e-4)
        return {"out": logp, "qy_x_r": qy, "qy_x_n": 1.0 - qy}

    rep = reconstruction_report(None, forward, arrays, CFG, batch_size=B,
                                has_subdecoders=False)
    assert abs(rep["acc_x"] - 1.0) < 1e-6
    assert abs(rep["acc_q_x_r"] - 0.75) < 1e-9
    # flipped posteriors: argmax [1, 0, 1, 1] vs [0, 1, 1, 0] -> 1/4
    assert abs(rep["acc_q_x_n"] - 0.25) < 1e-9


def test_latent_stats(arrays):
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)

    def encode_batched(batch, rng):
        x_oh = jax.nn.one_hot(batch["x"], CFG.roll_dims)
        (mu_r, std_r), (mu_n, std_n) = models.reg_vae_encode(params, x_oh)
        kr, kn = jax.random.split(rng)
        return (reparameterize(kr, mu_r, std_r),
                reparameterize(kn, mu_n, std_n))

    stats = latent_stats(encode_batched, arrays, CFG, batch_size=16)
    assert stats["z_r_min"] < stats["z_r_max"]
    assert stats["r_std"] > 0 and stats["n_std"] > 0


def test_latent_stats_consumes_tail_batch(arrays):
    """Stats must cover exactly N items even when N % batch_size != 0: a
    sentinel planted in the tail batch must show up in the min."""

    def passthrough_encode(batch, rng):
        # z[:, 0] := r_density, so z_r_min/max are corpus-wide density stats
        col = jax.numpy.asarray(batch["r_density"],
                                jax.numpy.float32)[:, None]
        z = jax.numpy.broadcast_to(col, (col.shape[0], CFG.z_dims))
        return z, z

    sub = {k: np.array(v[:43]) for k, v in arrays.items()}  # 2*16 + 11 tail
    sub["r_density"] = sub["r_density"].astype(np.float32)
    sub["r_density"][42] = -99.0                             # last tail item
    stats = latent_stats(passthrough_encode, sub, CFG, batch_size=16)
    assert stats["z_r_min"] == -99.0


def test_reconstruction_report_consumes_tail_batch(arrays):
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)
    shapes = []

    def forward(params, rng, batch):
        shapes.append(batch["x"].shape[0])        # records traced shapes
        x_oh = jax.nn.one_hot(batch["x"], CFG.roll_dims)
        r_oh = jax.nn.one_hot(batch["r"], CFG.rhythm_dims)
        n_oh = jax.nn.one_hot(batch["n"], CFG.note_dims)
        return models.reg_vae_forward(params, rng, x_oh, r_oh, n_oh,
                                      batch["c"], CFG)

    sub = {k: v[:43] for k, v in arrays.items()}
    rep = reconstruction_report(params, forward, sub, CFG, batch_size=16)
    # the 11-row tail shape was traced, i.e. a tail batch really executed
    assert sorted(set(shapes)) == [11, 16]
    assert 0.0 <= rep["acc_x"] <= 1.0


def test_mean_z_mode_is_deterministic(arrays):
    """sample_z=False slides around the posterior mean: the constructed z
    batch must not depend on the RNG key."""
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)
    ev = ControllabilityEvaluator(
        params, CFG, models.reg_vae_encode, models.reg_vae_global_decode,
        target="rhythm", epochs=1, num_of_samples=2, decode_steps=10,
        verbose=False, sample_z=False)
    items = {k: v[:3] for k, v in arrays.items()}
    vals = np.linspace(-1, 1, 8)
    z1 = ev._z_batch_many(items, vals, jax.random.PRNGKey(1))
    z2 = ev._z_batch_many(items, vals, jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    # sampled mode differs across keys
    ev_s = ControllabilityEvaluator(
        params, CFG, models.reg_vae_encode, models.reg_vae_global_decode,
        target="rhythm", epochs=1, num_of_samples=2, decode_steps=10,
        verbose=False, sample_z=True)
    s1 = ev_s._z_batch_many(items, vals, jax.random.PRNGKey(1))
    s2 = ev_s._z_batch_many(items, vals, jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_controllability_evaluator_runs(arrays):
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)
    ev = ControllabilityEvaluator(
        params, CFG, models.reg_vae_encode, models.reg_vae_global_decode,
        target="rhythm", epochs=1, num_of_samples=2, decode_steps=40,
        verbose=False)
    scores = ev.evaluate(arrays, min_val=-2.0, max_val=2.0,
                         r_std=0.16, n_std=0.89)
    for pair in (scores.consistency, scores.restrictiveness,
                 scores.monotonicity):
        assert np.isfinite(pair[0])


def test_reconstruction_report(arrays):
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)

    def forward(params, rng, batch):
        x_oh = jax.nn.one_hot(batch["x"], CFG.roll_dims)
        r_oh = jax.nn.one_hot(batch["r"], CFG.rhythm_dims)
        n_oh = jax.nn.one_hot(batch["n"], CFG.note_dims)
        return models.reg_vae_forward(params, rng, x_oh, r_oh, n_oh,
                                      batch["c"], CFG)

    rep = reconstruction_report(params, forward, arrays, CFG, batch_size=16)
    assert 0.0 <= rep["acc_x"] <= 1.0
    assert 0.0 <= rep["acc_r"] <= 1.0
    assert np.isfinite(rep["CE_X"]) and np.isfinite(rep["l_r"])


def test_arousal_transfer(tmp_path, arrays):
    cfg = ModelConfig(hidden_dims=32, z_dims=8, num_clusters=2)
    params = models.init_reg_gmvae(jax.random.PRNGKey(0), cfg)
    shifts = compute_shift_vectors(params)
    np.testing.assert_allclose(shifts["r_low_to_high"],
                               -shifts["r_high_to_low"])
    item = {k: v[0] for k, v in arrays.items()}
    toks, notes = arousal_transfer(params, cfg, item, "low_to_high",
                                   lam=2.0, steps=50)
    assert toks.shape == (50,)
    # output is in-vocab
    assert toks.min() >= 0 and toks.max() < 342
    out = str(tmp_path / "transfer.mid")
    transfer_to_midi(toks, out)
    import os
    assert os.path.getsize(out) > 20

    # temperature > 0: sampling decode, reproducible per rng, in-vocab
    rng = jax.random.PRNGKey(3)
    t1, _ = arousal_transfer(params, cfg, item, "low_to_high", lam=2.0,
                             steps=50, rng=rng, temperature=0.9)
    t2, _ = arousal_transfer(params, cfg, item, "low_to_high", lam=2.0,
                             steps=50, rng=rng, temperature=0.9)
    np.testing.assert_array_equal(t1, t2)
    assert t1.min() >= 0 and t1.max() < 342


def test_decode_all_pads_to_chunk(arrays):
    """_decode_all pads the wave to the chunk granularity and makes ONE
    decode call (kernel chunking lives inside the op now,
    ops/pallas_decode.py::_chunked_kernel_decode), then slices the pad off."""
    params = models.init_reg_vae(jax.random.PRNGKey(0), CFG)
    import jax.numpy as jnp
    calls = []

    def fake_decode_tokens(p, z, steps):
        calls.append(z.shape)
        # token = row index marker so reassembly is checkable
        return jnp.broadcast_to(jnp.arange(z.shape[0])[:, None],
                                (z.shape[0], steps)).astype(jnp.int32)
    ev = ControllabilityEvaluator(
        params, CFG, models.reg_vae_encode, models.reg_vae_global_decode,
        epochs=1, num_of_samples=2, decode_steps=5, verbose=False,
        decode_tokens=fake_decode_tokens)
    z = np.random.default_rng(0).normal(size=(70, 2 * CFG.z_dims + 24))
    toks = ev._decode_all(z)
    assert toks.shape == (70, 5)
    assert calls == [(128, z.shape[1])]       # one padded fixed-shape call
    # rows preserved in order; pad rows sliced off
    assert toks[0, 0] == 0 and toks[63, 0] == 63 and toks[69, 0] == 69


def test_metric_arithmetic_analytic(monkeypatch):
    """Pin the three Table-1 metric formulas to hand-computed values.

    Stubs replace the model and the token->attribute round trip (both are
    covered by their own tests) so the decoded densities are an exact,
    known function of (sample, slider index):
      rhythm density rd(si, k) = (k + si) / 16   (linear in the slider)
      note density   nd(si, k) = 2               (constant)
    With 2 samples, 8 slider values 0..7, target=rhythm (reference
    test_class.py:170-193 semantics):
      consistency     = 1 - mean_k std_si(rd/r_std) = 1 - (1/32)/r_std
      restrictiveness = 1 - mean_si std_k(nd/n_std) = 1
      monotonicity    = mean_si R^2(values, rd)     = 1   (exactly linear)
    """
    from music_fader_nets_tpu.eval import controllability as C

    cfg = ModelConfig(hidden_dims=8, z_dims=4, seq_len=16, attr_len=4)
    n_items, V8, L = 5, 8, 16

    def encode(params, x_oh):
        B = x_oh.shape[0]
        import jax.numpy as jnp
        mu = jnp.zeros((B, cfg.z_dims))
        std = jnp.ones((B, cfg.z_dims))
        return (mu, std), (mu, std)

    def decode_tokens(params, z, steps):
        # rows are sample-major groups of 8 (one per slider value); encode
        # (si, k) into the token stream: every position = 2 + si*8 + k
        M = z.shape[0]
        si = np.arange(M) // V8
        k = np.arange(M) % V8
        return np.broadcast_to((2 + si * 8 + k)[:, None], (M, steps))

    def fake_attributes(tokens, beat_res=4):
        v = int(np.asarray(tokens)[0]) - 2
        si, k = v // 8, v % 8
        ones = k + si
        rhythm = np.array([1] * ones + [0] * (L - ones))
        note = np.full(L, 2.0)
        return rhythm, note

    monkeypatch.setattr(C, "attributes_from_tokens", fake_attributes)
    arrays = {
        "x": np.zeros((n_items, cfg.seq_len), np.int32),
        "c": np.zeros((n_items, 24), np.float32),
    }
    r_std, n_std = 0.25, 0.5
    ev = C.ControllabilityEvaluator(
        params=None, cfg=cfg, encode=encode, decode=None, target="rhythm",
        epochs=1, num_of_samples=2, decode_steps=12, verbose=False,
        decode_tokens=decode_tokens, sample_z=False)
    s = ev.evaluate(arrays, min_val=0.0, max_val=8.0, r_std=r_std,
                    n_std=n_std)
    assert abs(s.consistency[0] - (1 - (1 / 32) / r_std)) < 1e-9
    assert abs(s.restrictiveness[0] - 1.0) < 1e-9
    assert abs(s.monotonicity[0] - 1.0) < 1e-9

    # target=note: nd(si,k) = k (linear), rd(si,k) = k/16 now NON-target:
    #   consistency     = 1 - mean_k std_si(k/n_std)       = 1 (same across si)
    #   restrictiveness = 1 - mean_si std_k(rd/r_std)
    #                   = 1 - std({0..7})/16/r_std
    #   monotonicity    = 1 (nd exactly linear in the slider)
    def fake_attributes_note(tokens, beat_res=4):
        v = int(np.asarray(tokens)[0]) - 2
        si, k = v // 8, v % 8
        rhythm = np.array([1] * k + [0] * (L - k))
        note = np.full(L, float(k))
        return rhythm, note

    monkeypatch.setattr(C, "attributes_from_tokens", fake_attributes_note)
    ev = C.ControllabilityEvaluator(
        params=None, cfg=cfg, encode=encode, decode=None, target="note",
        epochs=1, num_of_samples=2, decode_steps=12, verbose=False,
        decode_tokens=decode_tokens, sample_z=False)
    s = ev.evaluate(arrays, min_val=0.0, max_val=8.0, r_std=r_std,
                    n_std=n_std)
    expect_restrict = 1 - np.std(np.arange(8)) / 16 / r_std
    assert abs(s.consistency[0] - 1.0) < 1e-9
    assert abs(s.restrictiveness[0] - expect_restrict) < 1e-9
    assert abs(s.monotonicity[0] - 1.0) < 1e-9


def test_evaluator_discard_paths(monkeypatch):
    """Samples whose decode fails the attribute round trip are discarded
    (reference test_class.py:156-163); the attempt budget is 4x the sample
    count; a fully-degenerate epoch reports NaN instead of tripping numpy
    empty-slice warnings."""
    import warnings
    from music_fader_nets_tpu.eval import controllability as C

    cfg = ModelConfig(hidden_dims=8, z_dims=4, seq_len=16, attr_len=4)

    def encode(params, x_oh):
        import jax.numpy as jnp
        B = x_oh.shape[0]
        return ((jnp.zeros((B, cfg.z_dims)), jnp.ones((B, cfg.z_dims))),) * 2

    def decode_tokens(params, z, steps):
        # row index marker (sample-major rows, 8 values per sample)
        return np.broadcast_to(2 + np.arange(z.shape[0])[:, None],
                               (z.shape[0], steps))

    arrays = {"x": np.zeros((5, 16), np.int32),
              "c": np.zeros((5, 24), np.float32)}

    def make_ev():
        return C.ControllabilityEvaluator(
            None, cfg, encode, None, target="rhythm", epochs=1,
            num_of_samples=2, decode_steps=8, verbose=False,
            decode_tokens=decode_tokens, sample_z=False)

    # odd wave positions fail the round trip -> discarded, loop refills
    def attrs_partial(tokens, beat_res=4):
        si = (int(np.asarray(tokens)[0]) - 2) // 8
        if si % 2 == 1:
            return None
        k = (int(np.asarray(tokens)[0]) - 2) % 8
        return np.array([1] * k + [0] * (16 - k)), np.full(16, 2.0)

    monkeypatch.setattr(C, "attributes_from_tokens", attrs_partial)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = make_ev().evaluate(arrays, 0.0, 8.0, 0.25, 0.5)
    assert np.isfinite(s.monotonicity[0])      # refilled to 2 kept samples

    # everything fails -> explicit NaN epoch, no numpy warnings
    monkeypatch.setattr(C, "attributes_from_tokens",
                        lambda t, beat_res=4: None)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        s = make_ev().evaluate(arrays, 0.0, 8.0, 0.25, 0.5)
    assert np.isnan(s.consistency[0]) and np.isnan(s.monotonicity[0])
