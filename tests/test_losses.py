"""Loss-term parity tests: against torch for the ELBO primitives, against
hand-rolled numpy for the regularizers, plus the documented schedule quirks."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from torch.distributions import Normal, kl_divergence

from music_fader_nets_tpu.losses.elbo import (
    anneal_beta, kl_std_normal, nll_mean,
)
from music_fader_nets_tpu.losses.regularizers import (
    adversarial_fader_loss,
    approx_note_density,
    approx_rhythm_density,
    gmm_supervised_kl,
    gmm_unsupervised_kl,
    pati_regularizer,
)


def test_nll_matches_torch():
    torch.manual_seed(0)
    logits = torch.randn(4, 7, 11)
    logp = F.log_softmax(logits, dim=-1)
    tgt = torch.randint(0, 11, (4, 7))
    ref = F.nll_loss(logp.view(-1, 11), tgt.view(-1), reduction="mean").item()
    got = nll_mean(jnp.asarray(logp.numpy()), jnp.asarray(tgt.numpy()))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_kl_std_normal_matches_torch():
    torch.manual_seed(1)
    mu = torch.randn(5, 9)
    std = torch.rand(5, 9) + 0.1
    ref = kl_divergence(Normal(mu, std),
                        Normal(torch.zeros_like(mu), torch.ones_like(std))
                        ).mean().item()
    got = kl_std_normal(jnp.asarray(mu.numpy()), jnp.asarray(std.numpy()))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_anneal_beta_negative_window_quirk():
    """reference trainer.py:93-96: beta0 is negative for 1000 < step < 10000."""
    beta = 0.2
    assert float(anneal_beta(jnp.asarray(500), beta)) == 0.0
    assert float(anneal_beta(jnp.asarray(5000), beta)) < 0.0     # the quirk
    np.testing.assert_allclose(float(anneal_beta(jnp.asarray(15000), beta)),
                               0.1, rtol=1e-6)
    np.testing.assert_allclose(float(anneal_beta(jnp.asarray(30000), beta)),
                               beta, rtol=1e-6)
    # fixed mode clamps at zero
    assert float(anneal_beta(jnp.asarray(5000), beta, faithful=False)) == 0.0


def test_anneal_beta_linear_warmup():
    """kl_warmup_steps replaces the schedule with linear 0 -> beta."""
    beta = 0.2
    np.testing.assert_allclose(
        float(anneal_beta(jnp.asarray(0), beta, warmup_steps=800)), 0.0)
    np.testing.assert_allclose(
        float(anneal_beta(jnp.asarray(400), beta, warmup_steps=800)),
        0.1, rtol=1e-6)
    np.testing.assert_allclose(
        float(anneal_beta(jnp.asarray(5000), beta, warmup_steps=800)),
        beta, rtol=1e-6)


def test_pati_regularizer_matches_reference_formula():
    """reference trainer.py:117-132 via numpy np.subtract.outer."""
    rng = np.random.default_rng(0)
    z0 = rng.normal(size=8).astype(np.float32)
    attr = rng.random(8).astype(np.float32)
    d_attr = np.subtract.outer(attr, attr)
    d_z = z0.reshape(-1, 1) - z0
    ref = np.mean((np.tanh(d_z) - np.sign(d_attr)) ** 2)
    got = pati_regularizer(jnp.asarray(z0), jnp.asarray(attr))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_adversarial_loss_ramp():
    d = jnp.ones((4, 1)) * 0.5
    t = jnp.zeros((4, 1))
    mid = adversarial_fader_loss(jnp.asarray(1000.0), d, t)
    full = adversarial_fader_loss(jnp.asarray(4000.0), d, t)
    np.testing.assert_allclose(float(mid), 0.5e-4 * 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(full), 1e-4 * 0.25, rtol=1e-5)


def _torch_gmm_unsup(mu, std, qy, loglogit, mu_lk, logvar_lk):
    """Reference trainer_gmm.py:150-178 K-loop, in torch."""
    K = qy.shape[-1]
    kld_lat = torch.zeros(1)
    dis = Normal(mu, std)
    for k in range(K):
        p = Normal(mu_lk[k], logvar_lk[k].exp())
        kl = kl_divergence(dis, p).mean(dim=-1) * qy[:, k]
        kld_lat += kl.mean()
    h = torch.mean(qy * F.log_softmax(loglogit, dim=1), dim=1)
    kld_cls = (h - np.log(1.0 / K)).mean()
    return kld_lat.item(), kld_cls.item()


def test_gmm_unsupervised_kl_matches_torch_loop():
    torch.manual_seed(2)
    B, D, K = 6, 5, 3
    mu = torch.randn(B, D)
    std = torch.rand(B, D) + 0.1
    loglogit = torch.randn(B, K)
    qy = F.softmax(loglogit, dim=-1)
    mu_lk = torch.randn(K, D)
    logvar_lk = torch.full((K, D), -4.0)
    ref_lat, ref_cls = _torch_gmm_unsup(mu, std, qy, loglogit, mu_lk, logvar_lk)
    got_lat, got_cls = gmm_unsupervised_kl(
        jnp.asarray(mu.numpy()), jnp.asarray(std.numpy()),
        jnp.asarray(qy.numpy()), jnp.asarray(loglogit.numpy()),
        jnp.asarray(mu_lk.numpy()), jnp.asarray(logvar_lk.numpy()))
    np.testing.assert_allclose(float(got_lat), ref_lat, rtol=1e-4)
    np.testing.assert_allclose(float(got_cls), ref_cls, rtol=1e-4)


def test_gmm_supervised_kl_matches_torch():
    torch.manual_seed(3)
    B, D, K = 6, 5, 2
    mu = torch.randn(B, D)
    std = torch.rand(B, D) + 0.1
    y = torch.randint(0, K, (B,))
    qy = F.softmax(torch.randn(B, K), dim=-1)
    mu_lk = torch.randn(K, D)
    logvar_lk = torch.full((K, D), -4.0)

    p = Normal(mu_lk[y], logvar_lk[y].exp())
    ref_lat = kl_divergence(Normal(mu, std), p).mean(dim=-1).mean().item()
    # reference feeds softmax probs into CrossEntropyLoss (double softmax)
    ref_ce = torch.nn.CrossEntropyLoss()(qy, y).item()

    got_lat, got_ce = gmm_supervised_kl(
        jnp.asarray(mu.numpy()), jnp.asarray(std.numpy()),
        jnp.asarray(y.numpy()), jnp.asarray(qy.numpy()),
        jnp.asarray(mu_lk.numpy()), jnp.asarray(logvar_lk.numpy()))
    np.testing.assert_allclose(float(got_lat), ref_lat, rtol=1e-4)
    np.testing.assert_allclose(float(got_ce), ref_ce, rtol=1e-4)


def test_glsr_soft_attributes():
    """Soft note/rhythm density against a direct Python port of the
    reference recurrence (trainer_glsr.py:141-171)."""
    rng = np.random.default_rng(5)
    B, T, V = 3, 20, 342
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    # spike some positions to exceed the 0.9 separator threshold
    for b in range(B):
        for t in range(0, T, 4):
            logits[b, t, 200] = 12.0
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    probs = np.asarray(jax.nn.softmax(logp, -1))
    played = probs[..., 2:90].sum(-1)
    sep = probs[..., 180:278].sum(-1)

    nd_ref = played.sum(-1)
    np.testing.assert_allclose(approx_note_density(logp), nd_ref, rtol=1e-4)

    # python port of the reference loop (batch0 faithful)
    def ref_rd(b):
        total, cur = 0.0, 0.0
        for i in range(T):
            if sep[b, i] < 0.9:
                cur += played[0, i]
            else:
                if cur == 0:
                    continue
                elif cur > 1e-2:
                    total += 1.0
                else:
                    total += cur
                cur = 0.0
        return total / sep[b].sum()

    rd_ref = np.array([ref_rd(b) for b in range(B)])
    got = approx_rhythm_density(logp, faithful_batch0=True)
    np.testing.assert_allclose(got, rd_ref, rtol=1e-4)


def test_free_bits_floor():
    """free_bits floors each dim's KL before the mean: dims below the floor
    contribute exactly free_bits and feel no gradient; dims above are
    untouched; free_bits=0 is the reference behavior bit-for-bit."""
    from music_fader_nets_tpu.losses.elbo import kl_std_normal
    mu = jnp.array([[0.0, 3.0]])          # dim0 KL = 0, dim1 KL = 4.5
    std = jnp.ones((1, 2))
    base = kl_std_normal(mu, std)
    np.testing.assert_allclose(base, 4.5 / 2, rtol=1e-6)
    np.testing.assert_allclose(kl_std_normal(mu, std, free_bits=0.0), base)
    np.testing.assert_allclose(kl_std_normal(mu, std, free_bits=0.5),
                               (0.5 + 4.5) / 2, rtol=1e-6)
    # no KL gradient on a floored dim; untouched gradient above the floor
    g = jax.grad(lambda m: kl_std_normal(m, std, free_bits=0.5))(mu)
    assert g[0, 0] == 0.0 and g[0, 1] != 0.0


def test_free_bits_config_threads_through_losses():
    """cfg.free_bits > 0 changes the KLD metric of every ELBO family and
    the GM-VAE latent KL (and nothing else blows up)."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.train import objectives

    key = jax.random.PRNGKey(7)
    B = 4
    ks = jax.random.split(key, 7)
    batch = {
        "x": jax.random.randint(ks[0], (B, 10), 0, 342),
        "r": jax.random.randint(ks[1], (B, 4), 0, 3),
        "n": jax.random.randint(ks[2], (B, 4), 0, 16),
        "c": jax.random.uniform(ks[3], (B, 24)),
        "r_density": jax.random.uniform(ks[4], (B,)),
        "n_density": jax.random.uniform(ks[5], (B,)),
        "a": jax.random.randint(ks[6], (B,), 0, 2),
    }
    step = jnp.asarray(0, jnp.int32)
    # the floor must sit above at least one dim's KL to bite: the N(0,1)
    # KLs start near 0/dim, the GM-VAE component KLs start large
    for name, init, lossf, kl_key, fb in [
            ("vanilla", models.init_reg_vae, objectives.vanilla_loss, "KLD",
             0.25),
            ("gmm", models.init_reg_gmvae, objectives.gmm_loss,
             "kld_latent", 1e5),
            ("singlevae", models.init_single_vae, objectives.singlevae_loss,
             "KLD", 0.25)]:
        cfg0 = ModelConfig(hidden_dims=16, z_dims=8, seq_len=10, attr_len=4,
                           num_clusters=2)
        cfg1 = ModelConfig(hidden_dims=16, z_dims=8, seq_len=10, attr_len=4,
                           num_clusters=2, free_bits=fb)
        p = init(key, cfg0)
        _, m0 = lossf(p, key, batch, step, cfg0)
        _, m1 = lossf(p, key, batch, step, cfg1)
        assert float(m1[kl_key]) > float(m0[kl_key]), name
        assert np.isfinite(float(m1["loss"])), name
