"""Multi-chip correctness on a virtual 8-device CPU mesh: the sharded
(dp x tp) train step must match the single-device result bit-for-bit up to
reduction order."""
import jax
import numpy as np
import pytest

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu import models
from music_fader_nets_tpu.data.datasets import YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus
from music_fader_nets_tpu.parallel import mesh as mesh_lib
from music_fader_nets_tpu.train import Trainer, vanilla_loss, gmm_loss

CFG = ModelConfig(hidden_dims=32, z_dims=8, batch_size=16, seq_len=40,
                  attr_len=8)


@pytest.fixture(scope="module")
def arrays():
    return YamahaDataset(*synth_corpus(64, 40, 8), mode="train").arrays()


def test_eight_devices_available():
    assert jax.device_count() >= 8


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2), (2, 4)])
@pytest.mark.slow
def test_sharded_step_matches_single_device(arrays, n_data, n_model):
    batch = {k: v[:16] for k, v in arrays.items()}

    ref = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss}, seed=3)
    mesh = mesh_lib.make_mesh(n_data, n_model)
    sh = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss},
                 mesh=mesh, seed=3)

    rng = jax.random.PRNGKey(0)
    ref_state, ref_m = ref._train_steps["default"](ref.state, batch, rng)
    sh_state, sh_m = sh._train_steps["default"](
        sh.state, mesh_lib.shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(ref_m["loss"]), float(sh_m["loss"]),
                               rtol=2e-5)
    # spot-check a TP-sharded weight after the update
    a = np.asarray(ref_state.params["grucell_g"]["w_hh"])
    b = np.asarray(jax.device_get(sh_state.params["grucell_g"]["w_hh"]))
    np.testing.assert_allclose(a, b, atol=2e-5)


@pytest.mark.slow
def test_gmm_sharded_runs(arrays):
    mesh = mesh_lib.make_mesh(4, 2)
    tr = Trainer(CFG, models.init_reg_gmvae, {"default": gmm_loss}, mesh=mesh)
    metrics = tr.run_epoch(arrays, seed=0)
    assert np.isfinite(metrics["loss"])
