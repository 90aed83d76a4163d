"""Fast (kernel-layout) parameter views — models/fast.py.

The Trainer converts the canonical reference-named pytree to pre-stacked /
pre-padded kernel layout at the jit boundary (once per compiled epoch).
These tests pin: exact round-trip for every family, loss equality between
layouts, optimizer-state conversion, and that the parity-only frozen
leaves survive a training epoch untouched.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_fader_nets_tpu import models
from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.data.datasets import YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus
from music_fader_nets_tpu.models import fast as fast_lib
from music_fader_nets_tpu.train import Trainer
from music_fader_nets_tpu.train.objectives import (
    cvae_loss,
    fader_loss,
    glsr_loss,
    gmm_loss,
    singlevae_loss,
    vanilla_loss,
)

CFG = ModelConfig(hidden_dims=32, z_dims=8, batch_size=8, seq_len=40,
                  attr_len=8, num_clusters=2)

FAMILIES = [
    ("reg_vae", models.init_reg_vae, {"enc_rn", "sub_rn"}),
    ("reg_gmvae", models.init_reg_gmvae, {"enc_rn", "sub_rn"}),
    ("single_vae", models.init_single_vae, {"enc_1"}),
    ("cvae", models.init_cvae, {"enc_e"}),
    ("fader", models.init_fader, {"enc_e"}),
    ("single_gmvae", models.init_single_gmvae, {"enc_1"}),
]


@pytest.fixture(scope="module")
def yamaha():
    return YamahaDataset(*synth_corpus(64, 40, 8), mode="train").arrays()


@pytest.mark.parametrize("name,init,groups", FAMILIES)
def test_split_merge_round_trip_exact(name, init, groups):
    p = init(jax.random.PRNGKey(0), CFG)
    fp, frozen = fast_lib.split_fast(p)
    assert groups <= set(fp), (name, sorted(fp))
    # every frozen leaf really is absent from the fast (carried) tree
    assert not set(frozen) & set(fp)
    back = fast_lib.merge_canonical(fp, frozen, p)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(p))
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p),
                               jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"{name} {kp}")


def test_pad_regions_are_zero():
    p = models.init_reg_vae(jax.random.PRNGKey(0), CFG)
    fp, _ = fast_lib.split_fast(p)
    V = p["gru_r"]["fwd"]["w_ih"].shape[0]
    assert np.all(np.asarray(fp["enc_rn"]["w_ih_p"][:, V:]) == 0.0)
    Vd = p["linear_out_g"]["w"].shape[1]
    assert np.all(np.asarray(fp["grucell_g"]["w_tok_p"][Vd:]) == 0.0)
    # sub_rn scatter: the rhythm stream's pad rows (between its 3 track
    # rows and the shared z rows) are zero
    Z = p["mu_r"]["w"].shape[1]
    dr = p["gru_d_r"]["w_ih"].shape[0] - Z
    dm = fp["sub_rn"]["w_ih"].shape[1] - Z
    assert np.all(np.asarray(fp["sub_rn"]["w_ih"][0, dr:dm]) == 0.0)


@pytest.mark.parametrize("name,init,loss_fn", [
    ("vanilla", models.init_reg_vae, vanilla_loss),
    ("gmm", models.init_reg_gmvae, gmm_loss),
    ("gmm_sup", models.init_reg_gmvae,
     functools.partial(gmm_loss, is_supervised=True)),
    ("glsr", models.init_reg_vae, glsr_loss),
    ("cvae", models.init_cvae, cvae_loss),
    ("fader", models.init_fader, fader_loss),
    ("singlevae", models.init_single_vae, singlevae_loss),
])
def test_loss_layout_equality(yamaha, name, init, loss_fn):
    """Every objective computes the same loss from either layout."""
    batch = {k: v[: CFG.batch_size] for k, v in yamaha.items()}
    if name == "gmm_sup":
        batch["a"] = np.zeros((CFG.batch_size,), np.int32)
    p = init(jax.random.PRNGKey(1), CFG)
    fp, _ = fast_lib.split_fast(p)
    rng = jax.random.PRNGKey(2)
    step = jnp.asarray(30)  # past the GLSR gate (reference trainer_glsr:253)
    l_can, _ = loss_fn(p, rng, batch, step, CFG)
    l_fast, _ = loss_fn(fp, rng, batch, step, CFG)
    np.testing.assert_allclose(float(l_can), float(l_fast), rtol=2e-5)


def test_grad_layout_equality(yamaha):
    """Grads w.r.t. canonical params match whether the forward stacks
    in-graph (old path) or the loss sees the pre-stacked view (new path,
    grads flowing back through the split transpose)."""
    batch = {k: v[: CFG.batch_size] for k, v in yamaha.items()}
    p = models.init_reg_gmvae(jax.random.PRNGKey(1), CFG)
    rng = jax.random.PRNGKey(2)

    def loss_can(params):
        return gmm_loss(params, rng, batch, jnp.asarray(0), CFG)[0]

    def loss_fast(params):
        fp, _ = fast_lib.split_fast(params)
        return gmm_loss(fp, rng, batch, jnp.asarray(0), CFG)[0]

    g1 = jax.grad(loss_can)(p)
    g2 = jax.grad(loss_fast)(p)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g1),
                               jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=str(kp))


def test_opt_state_round_trip(yamaha):
    import optax
    from music_fader_nets_tpu.train.trainer import make_optimizer
    p = models.init_reg_gmvae(jax.random.PRNGKey(0), CFG)
    opt = make_optimizer(CFG)
    st = opt.init(p)
    fast_opt, frozen_opt = fast_lib.opt_state_split_fast(st)
    back = fast_lib.opt_state_merge_canonical(fast_opt, frozen_opt, p)
    assert (jax.tree_util.tree_structure(back)
            == jax.tree_util.tree_structure(st))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epoch_keeps_frozen_leaves_and_structure(yamaha):
    """A compiled training epoch must leave the parity-only frozen leaves
    bit-identical (the reference's Adam never touches them either: their
    .grad stays None) and return the canonical structure."""
    tr = Trainer(CFG, models.init_reg_gmvae, {"default": gmm_loss})
    before = {k: jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                        tr.params[k])
              for k in fast_lib.FROZEN_KEYS if k in tr.params}
    assert before, "expected frozen leaves in the RegGMVAE pytree"
    m = tr.run_epoch(yamaha, seed=0)
    assert np.isfinite(m["loss"])
    for k, sub in before.items():
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(sub),
                jax.tree_util.tree_leaves_with_path(tr.params[k])):
            np.testing.assert_array_equal(a, np.asarray(b),
                                          err_msg=f"{k} {kp}")
    # trained leaves did move
    assert not np.array_equal(
        np.asarray(tr.params["gru_r"]["fwd"]["w_ih"]),
        models.init_reg_gmvae(jax.random.PRNGKey(0), CFG)
        ["gru_r"]["fwd"]["w_ih"])
