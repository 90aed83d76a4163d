"""CLI integration: the public `python trainer.py` / `test_*_v2.py` surface
driven as subprocesses on CPU (tiny sizes)."""
import os
import subprocess
import sys

import pytest

# whole-CLI subprocesses recompile everything from scratch — minutes each
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # single CPU device is fine here
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.parametrize("extra", [[], ["--fixed-quirks"]])
def test_trainer_cli_end_to_end(tmp_path, extra):
    out = _run(["trainer.py", "--platform", "cpu", "--epochs", "1",
                "--batch-size", "8", "--synthetic-size", "48",
                "--save-dir", str(tmp_path)] + extra)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "train loss:" in out.stdout
    assert "[test]" in out.stdout
    # per-epoch checkpoint + timestamped copy on disk
    ckpts = os.listdir(tmp_path)
    assert any(c == "music_attr_vae_reg_vanilla" for c in ckpts)
    assert any(c.startswith("music_attr_vae_reg_vanilla_2") for c in ckpts)


def test_trainer_gmm_cli_on_ragged_vgmidi(tmp_path):
    """GM-VAE dual-corpus CLI straight off released-format VGMIDI arrays:
    dtype=object .npy files of ragged per-song sequences (EOS re-insert +
    pad + unpadded densities path, reference ptb_v2.py:459-473), and the
    final evaluation phase reporting the VGMIDI supervised splits with
    qy_x arousal-classification accuracy (trainer_gmm.py:570-585)."""
    gen = (
        "import numpy as np; "
        "from music_fader_nets_tpu.data.synthetic import synth_vgmidi_ragged; "
        "d, r, n, a, v, c = synth_vgmidi_ragged(48, 60, 8); "
        f"dirp = r'{tmp_path}'; "
        "np.save(dirp + '/song_tokens.npy', d); "
        "np.save(dirp + '/rhythm_lst.npy', r); "
        "np.save(dirp + '/note_lst.npy', n); "
        "np.save(dirp + '/arousal_lst.npy', a); "
        "np.save(dirp + '/valence_lst.npy', v); "
        "np.save(dirp + '/chroma_lst.npy', c)"
    )
    out = subprocess.run([sys.executable, "-c", gen], cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]

    out = _run(["trainer_gmm.py", "--platform", "cpu", "--epochs", "1",
                "--batch-size", "8", "--synthetic-size", "48",
                "--vgmidi-dir", str(tmp_path),
                "--save-dir", str(tmp_path / "params")], timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "vgmidi train - " in out.stdout
    assert "[vgmidi train]" in out.stdout and "[vgmidi test]" in out.stdout
    assert "acc_q_x_r" in out.stdout and "acc_q_x_n" in out.stdout

    # arousal transfer off the just-trained checkpoint, picking its source
    # segment from the same ragged test split (notebook cells 8-17 path)
    out = _run(["arousal_transfer.py", "--platform", "cpu",
                "--vgmidi-dir", str(tmp_path),
                "--save-dir", str(tmp_path / "params"),
                "--steps", "30", "--synthetic-size", "48",
                "--out", str(tmp_path / "t.mid")], timeout=1500)
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(tmp_path / "t.mid")


def test_parity_harness_on_synthetic_standins(tmp_path):
    """parity.py end-to-end on synthetic stand-ins for the released blobs:
    an exported .pt (round-trip + torch forward parity + Table-1 eval) and a
    canonical token array (re-encode check). The real artifacts drop in via
    the same flags (VERDICT round-1 item 3)."""
    gen = (
        "import numpy as np, torch, jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "from music_fader_nets_tpu.config import ModelConfig; "
        "from music_fader_nets_tpu.models import init_reg_gmvae; "
        "from music_fader_nets_tpu.utils.checkpoint import "
        "params_to_torch_state_dict; "
        "from music_fader_nets_tpu.tokenizer.performance_codec import "
        "performance_encode; "
        "from music_fader_nets_tpu.tokenizer.midi_io import MidiNote; "
        "p = init_reg_gmvae(jax.random.PRNGKey(7), "
        "ModelConfig(num_clusters=2)); "
        "sd = {k: torch.from_numpy(np.array(v)) for k, v in "
        "params_to_torch_state_dict(p).items()}; "
        f"torch.save(sd, r'{tmp_path}/music_attr_vae_reg_gmm.pt'); "
        "notes = [MidiNote(60 + i % 12, 64, 0.3 * i, 0.3 * i + 0.2) "
        "for i in range(8)]; "
        "t = performance_encode(notes, add_eos=True); "
        f"np.save(r'{tmp_path}/song_tokens.npy', "
        "np.stack([np.pad(t, (0, 120 - len(t)))]))"
    )
    out = subprocess.run([sys.executable, "-c", gen], cwd=REPO,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]

    out = _run(["parity.py", "--from-pt",
                str(tmp_path / "music_attr_vae_reg_gmm.pt"),
                "--tokens", str(tmp_path / "song_tokens.npy"),
                "--platform", "cpu", "--synthetic-size", "48",
                "--samples", "1", "--eval-epochs", "1",
                "--decode-steps", "10"])
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    assert "PARITY: ALL PASS" in out.stdout
    assert "converter round trip" in out.stdout
    assert "100.00%" in out.stdout


def test_parity_sweep_over_six_standins(tmp_path):
    """parity.py --params-dir (round-4 VERDICT next #5): six synthetic
    stand-ins named exactly as the released blobs -> converter round-trip
    + torch forward parity per checkpoint + ONE summary table; a missing
    checkpoint flips the exit code. (--skip-eval keeps this a smoke test;
    the Table-1 leg is exercised by test_parity_harness_on_synthetic_
    standins above through the same run_table1_eval.)"""
    gen = (
        "import numpy as np, torch, jax; "
        "jax.config.update('jax_platforms', 'cpu'); "
        "from music_fader_nets_tpu.config import ModelConfig; "
        "from music_fader_nets_tpu.train.cli import MODEL_REGISTRY; "
        "from music_fader_nets_tpu.utils.checkpoint import "
        "params_to_torch_state_dict; "
        "import parity; "
        "cfg = ModelConfig(num_clusters=2, hidden_dims=32, z_dims=16, "
        "seq_len=12, attr_len=4); "
        "[torch.save({k: torch.from_numpy(np.array(v)) for k, v in "
        "params_to_torch_state_dict(MODEL_REGISTRY[kind]['init']("
        "jax.random.PRNGKey(i), cfg)).items()}, "
        f"r'{tmp_path}' + '/' + fname) "
        "for i, (fname, kind) in enumerate(parity.RELEASED_CKPTS)]"
    )
    out = subprocess.run([sys.executable, "-c", gen], cwd=REPO,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    out = _run(["parity.py", "--params-dir", str(tmp_path),
                "--skip-eval", "--platform", "cpu"], timeout=1500)
    assert out.returncode == 0, out.stdout[-1500:] + out.stderr[-1500:]
    assert "sweep summary:" in out.stdout
    assert "PARITY: ALL PASS" in out.stdout
    for kind in ("vanilla", "gmm", "glsr", "cvae", "fader", "singlevae"):
        line = next(ln for ln in out.stdout.splitlines()
                    if ln.startswith(kind))
        assert line.count("PASS") == 2 and "FAIL" not in line, line

    # a missing checkpoint must flip the exit code, not be skipped quietly;
    # an UNREADABLE one must mark its row FAIL and the sweep must still
    # validate the rest (per-checkpoint containment), not abort mid-table
    os.remove(tmp_path / "music_attr_fader.pt")
    (tmp_path / "music_attr_vae_reg_glsr.pt").write_bytes(b"not a torch file")
    out = _run(["parity.py", "--params-dir", str(tmp_path),
                "--skip-eval", "--platform", "cpu"], timeout=1500)
    assert out.returncode == 1
    assert "MISSING" in out.stdout
    assert "ERROR validating music_attr_vae_reg_glsr.pt" in out.stdout
    assert "FAILURES PRESENT" in out.stdout
    glsr_line = next(ln for ln in out.stdout.splitlines()
                     if ln.startswith("glsr"))
    assert "FAIL" in glsr_line
    # checkpoints after the corrupt one were still validated
    for kind in ("cvae", "singlevae"):
        line = next(ln for ln in out.stdout.splitlines()
                    if ln.startswith(kind))
        assert line.count("PASS") == 2, line


def test_dryrun_multichip_bootstraps_from_one_device():
    """Regression for the round-1 driver failure (MULTICHIP_r01.json rc=1):
    dryrun_multichip must self-bootstrap into an 8-device child even when the
    calling process has already committed a 1-device backend."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert jax.device_count() == 1, jax.device_count(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


def test_eval_cli_end_to_end(tmp_path):
    # random-init eval (warns, still produces the score block)
    out = _run(["test_vanilla_v2.py", "--platform", "cpu", "--samples", "1",
                "--eval-epochs", "1", "--decode-steps", "10",
                "--synthetic-size", "48", "--batch-size", "8",
                "--save-dir", str(tmp_path)])
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Consistency:" in out.stdout
    assert "Monotonicity:" in out.stdout
    assert "latent stats (train):" in out.stdout
    assert "latent stats (test):" in out.stdout


def test_condition_stds_source(tmp_path):
    """Condition-sweep normalizers branch on the loader's provenance stamp:
    reference constants for real data ("cache"/"midi"), train-split stds on
    the synthetic fallback corpus."""
    import numpy as np
    from types import SimpleNamespace
    from music_fader_nets_tpu.eval.cli import (
        CVAE_N_STD, CVAE_R_STD, _condition_stds)
    from music_fader_nets_tpu.train.cli import load_yamaha

    class FakeSplit:
        def __init__(self, arr, source):
            self._arr = arr
            self.source = source

        def arrays(self):
            return self._arr

    tr = {"r_density": np.array([0.1, 0.3, 0.5]),
          "n_density": np.array([1.0, 2.0, 4.0])}

    # synthetic fallback -> corpus stds
    r, n = _condition_stds({"train": FakeSplit(tr, "synthetic")})
    assert abs(r - float(np.std(tr["r_density"]))) < 1e-9
    assert abs(n - float(np.std(tr["n_density"]))) < 1e-9

    # real data (cache or midi rebuild) -> the reference's constants;
    # unknown provenance (no stamp) conservatively matches the reference
    for split in (FakeSplit(tr, "cache"), FakeSplit(tr, "midi"), object()):
        assert _condition_stds({"train": split}) == (CVAE_R_STD, CVAE_N_STD)

    # load_yamaha stamps every split with the loader's provenance
    args = SimpleNamespace(data_dir=str(tmp_path), midi_dirs=None,
                           synthetic_size=48)
    yam = load_yamaha(args, None)
    assert all(ds.source == "synthetic" for ds in yam.values())


@pytest.mark.slow
def test_notebook_executes(monkeypatch):
    """Execute arousal_transfer.ipynb end-to-end (the reference ships its
    transfer pipeline as a notebook; ours is a thin wrapper over
    transfer/arousal.py, reference arousal_transfer.ipynb cells 8-17)."""
    nbformat = pytest.importorskip("nbformat")
    nbconvert_pre = pytest.importorskip("nbconvert.preprocessors")
    ExecutePreprocessor = nbconvert_pre.ExecutePreprocessor

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    nb = nbformat.read(os.path.join(repo, "arousal_transfer.ipynb"),
                       as_version=4)
    # force CPU in the kernel subprocess: drop the axon plugin from
    # PYTHONPATH (JAX_PLATFORMS=cpu alone is ignored once it loads);
    # monkeypatch restores os.environ after the test
    monkeypatch.setenv("PYTHONPATH", repo)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    ep = ExecutePreprocessor(timeout=900, kernel_name="python3")
    ep.preprocess(nb, {"metadata": {"path": repo}})
    outputs = [o for c in nb.cells if c.cell_type == "code"
               for o in c.get("outputs", [])]
    assert not any(o.get("output_type") == "error" for o in outputs)
