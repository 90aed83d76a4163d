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


@pytest.mark.slow
def test_multihost_two_process_epoch():
    """The multi-host feeding path executed as REAL processes: 2 CPU
    processes x 4 virtual devices run one compiled training epoch + one
    small-split eval epoch through `shard_arrays_for_process` +
    `make_array_from_process_local_data` (train/trainer.py), and the losses
    must equal a single-process run over the equivalently-assembled batches.
    """
    import importlib.util
    import json
    import os
    import socket
    import subprocess
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "_multihost_worker", os.path.join(here, "_multihost_worker.py"))
    worker_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(worker_mod)
    corpus_arrays = worker_mod.corpus_arrays

    repo = os.path.dirname(here)
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    CORPUS, VAL, BS, NP_ = 64, 16, 16, 2
    procs = []
    for pid in range(NP_):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)          # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, worker, "--process-id", str(pid),
             "--num-processes", str(NP_), "--coordinator",
             f"localhost:{port}", "--corpus-size", str(CORPUS),
             "--val-size", str(VAL), "--batch-size", str(BS)],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    results = {}
    for pid, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=600)
        assert pr.returncode == 0, f"worker {pid} failed:\n{out}"
        line = [l for l in out.splitlines()
                if l.startswith("MULTIHOST_RESULT ")]
        assert line, f"worker {pid} printed no result:\n{out}"
        results[pid] = json.loads(line[-1].split(" ", 1)[1])
    # both processes see identical (replicated) metrics
    np.testing.assert_allclose(results[0]["train_loss"],
                               results[1]["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(results[0]["val_loss"],
                               results[1]["val_loss"], rtol=1e-6)

    # single-process reference over the SAME global batches: a global batch
    # b is [p0 rows b*8:(b+1)*8 of its half; p1 rows likewise] — reorder the
    # corpus so contiguous BS-blocks reproduce that assembly, then run the
    # unmeshed trainer
    cfg = ModelConfig(hidden_dims=16, z_dims=8, seq_len=12, attr_len=4,
                      batch_size=BS)
    full = corpus_arrays(CORPUS + VAL, cfg)
    train = {k: v[:CORPUS] for k, v in full.items()}
    val = {k: v[CORPUS:] for k, v in full.items()}

    def multihost_order(n, pc, bs):
        per, bsl = n // pc, bs // pc
        order = []
        for b in range(per // bsl):
            for p in range(pc):
                order += list(range(p * per + b * bsl,
                                    p * per + (b + 1) * bsl))
        return np.asarray(order)

    train = {k: v[multihost_order(CORPUS, NP_, BS)]
             for k, v in train.items()}
    val = {k: v[multihost_order(VAL, NP_, BS)] for k, v in val.items()}
    ref = Trainer(cfg, models.init_reg_vae, {"default": vanilla_loss},
                  seed=0)
    m_train = ref.run_epoch(train, train=True, shuffle=False)
    m_val = ref.run_epoch(val, train=False, shuffle=False)
    np.testing.assert_allclose(results[0]["train_loss"], m_train["loss"],
                               rtol=2e-5)
    np.testing.assert_allclose(results[0]["val_loss"], m_val["loss"],
                               rtol=2e-5)
