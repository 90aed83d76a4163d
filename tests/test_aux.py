"""Auxiliary subsystems: metrics logging, profiling, full-state resume,
VGMIDI annotation filtering."""
import json
import os

import jax
import numpy as np
import pytest

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu import models
from music_fader_nets_tpu.data.datasets import YamahaDataset
from music_fader_nets_tpu.data.synthetic import synth_corpus
from music_fader_nets_tpu.data.vgmidi_labels import (
    dtw_distance, dtw_kmeans, filter_annotations, get_average_av_values,
)
from music_fader_nets_tpu.train import Trainer, TrainState, vanilla_loss
from music_fader_nets_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint,
)
from music_fader_nets_tpu.utils.logging import MetricsLogger
from music_fader_nets_tpu.utils.profiling import StepTimer

CFG = ModelConfig(hidden_dims=16, z_dims=4, batch_size=8, seq_len=30,
                  attr_len=8)


def test_metrics_logger(tmp_path):
    lg = MetricsLogger("run1", log_dir=str(tmp_path))
    lg.log({"loss": 1.5}, step=10, split="train")
    lg.log({"loss": 1.2}, step=20, split="val")
    lg.close()
    lines = [json.loads(l) for l in open(lg.path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 10
    assert lines[1]["split"] == "val"


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        t.stop(np.asarray([1.0]))
    s = t.summary()
    assert s["n"] == 3 and s["p50_s"] >= 0


@pytest.mark.slow
def test_full_state_checkpoint_roundtrip(tmp_path):
    arrays = YamahaDataset(*synth_corpus(32, 30, 8), mode="train").arrays()
    tr = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss})
    tr.run_epoch(arrays, seed=0)
    path = str(tmp_path / "full")
    save_checkpoint(path, {"params": tr.state.params,
                           "opt_state": tr.state.opt_state,
                           "step": tr.state.step})
    tr2 = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss}, seed=9)
    got = restore_checkpoint(path, {"params": tr2.state.params,
                                    "opt_state": tr2.state.opt_state,
                                    "step": tr2.state.step})
    assert int(got["step"]) == int(tr.state.step) > 0
    a = jax.tree_util.tree_leaves(tr.state.opt_state)
    b = jax.tree_util.tree_leaves(got["opt_state"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # resumed training continues without error
    tr2.state = TrainState(got["params"], got["opt_state"], got["step"])
    m = tr2.run_epoch(arrays, seed=1)
    assert np.isfinite(m["loss"])


def test_dtw_distance():
    a = np.array([0.0, 1, 2, 3])
    assert dtw_distance(a, a) == 0.0
    # time-shifted series are closer under DTW than euclidean
    b = np.array([0.0, 0, 1, 2])
    assert dtw_distance(a, b) < np.linalg.norm(a - b)


def test_filter_annotations_drops_outlier_cluster():
    rng = np.random.default_rng(0)
    T = 20
    base = np.sin(np.linspace(0, 3, T))
    tight1 = base + rng.normal(0, 0.01, (6, T))           # big tight cluster
    tight2 = base + 2 + rng.normal(0, 0.01, (3, T))       # small tight cluster
    noisy = rng.normal(0, 3.0, (4, T))                    # high-variance
    arousal = np.concatenate([tight1, tight2, noisy])
    valence = rng.normal(0, 1, arousal.shape)
    a_mean, v_mean = filter_annotations(arousal, valence, seed=0)
    # kept cluster should be the larger tight one (near `base`)
    assert np.abs(a_mean - base).mean() < 0.5
    assert v_mean.shape == (T,)


def test_get_average_av_values():
    rng = np.random.default_rng(1)
    T = 10
    av = {}
    for i in range(1, 31):
        av[f"song_{i}"] = {
            "musicianship": 5 if i <= 20 else 1,      # 10 filtered out
            "arousal": (np.ones(T) * (i % 3)).tolist(),
            "valence": rng.normal(0, 1, T).tolist(),
        }
    res = get_average_av_values(av, "song")
    assert res is not None
    a, v = res
    assert a.shape == (T,) and v.shape == (T,)
    assert get_average_av_values({}, "nope") is None


def test_shard_arrays_for_process():
    """Multi-host corpus slicing: equal contiguous shards, full coverage up
    to the dropped remainder, no-op for a single process."""
    from music_fader_nets_tpu.data.loader import shard_arrays_for_process
    arrays = {"x": np.arange(35), "y": np.arange(35) * 2}

    shards = [shard_arrays_for_process(arrays, process_index=i,
                                       process_count=4) for i in range(4)]
    assert all(len(s["x"]) == 8 for s in shards)          # 35 // 4
    got = np.concatenate([s["x"] for s in shards])
    np.testing.assert_array_equal(got, np.arange(32))     # 3 dropped, no dup
    # keys sliced consistently
    np.testing.assert_array_equal(shards[2]["y"], shards[2]["x"] * 2)

    # single process: identity
    same = shard_arrays_for_process(arrays, process_index=0, process_count=1)
    assert same["x"] is arrays["x"]

    # defaults pull jax.process_index/count (single-process here)
    assert shard_arrays_for_process(arrays)["x"] is arrays["x"]

    # unshardable corpus
    import pytest
    with pytest.raises(ValueError):
        shard_arrays_for_process({"x": np.arange(3)}, process_index=0,
                                 process_count=4)


def test_trainer_epoch_on_process_shard():
    """A simulated 2-process shard trains the same-shaped steps as the full
    corpus (lockstep batch counts across hosts)."""
    from music_fader_nets_tpu.data.loader import (
        num_batches, shard_arrays_for_process,
    )
    arrays = YamahaDataset(*synth_corpus(64, 30, 8), mode="train").arrays()
    s0 = shard_arrays_for_process(arrays, 0, 2)
    s1 = shard_arrays_for_process(arrays, 1, 2)
    assert num_batches(s0, CFG.batch_size) == num_batches(s1, CFG.batch_size)
    tr = Trainer(CFG, models.init_reg_vae, {"default": vanilla_loss})
    m = tr.run_epoch(s0, seed=0)
    assert np.isfinite(m["loss"])


def test_trainer_local_batch_size_multihost(monkeypatch):
    """Multi-host feeding splits the GLOBAL batch across processes (each
    host stacks bs // pc rows; the trainer assembles global arrays) —
    regression for the double-sharding where each host fed full-bs batches
    from its private corpus shard."""
    from music_fader_nets_tpu.parallel.mesh import make_mesh
    from music_fader_nets_tpu.train.trainer import Trainer
    from music_fader_nets_tpu.config import ModelConfig
    import pytest as _pytest

    cfg = ModelConfig(hidden_dims=8, z_dims=4, batch_size=16, seq_len=8,
                      attr_len=4)
    tr = Trainer(cfg, models.init_reg_vae, {"default": lambda *a, **k: 0},
                 mesh=make_mesh(8, 1))
    assert tr._local_batch_size(16) == 16          # single process: full bs
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    assert tr._local_batch_size(16) == 4           # bs // pc per host
    with _pytest.raises(ValueError):
        tr._local_batch_size(18)                   # indivisible global bs
