"""bench.py wedge-guard unit tests (pure host-side logic, no backend).

The guard exists because the axon TPU tunnel has twice wedged so hard that
backend init hangs for hours; the driver's round-end `python bench.py` must
still print ONE parseable JSON line. These tests cover the fallback payloads
and the child-output parsing; the child-spawn path itself is exercised
manually (it needs a live/wedged TPU backend to be meaningful).
"""
import json

import bench


def test_emit_stale_without_last_good(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(bench, "LAST_GOOD", str(tmp_path / "none.json"))
    bench._emit_stale("no backend")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["metric"] == "gmvae_train_seqs_per_sec_per_chip"
    assert out["value"] is None
    assert out["error"] == "no backend"


def test_emit_stale_flags_last_good(tmp_path, monkeypatch, capsys):
    lg = tmp_path / "last_good.json"
    lg.write_text(json.dumps({"metric": "gmvae_train_seqs_per_sec_per_chip",
                              "value": 24362.5, "unit": "seq/s"}))
    monkeypatch.setattr(bench, "LAST_GOOD", str(lg))
    bench._emit_stale("timed out")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 24362.5
    assert out["stale"] is True
    assert out["stale_reason"] == "timed out"
    assert out["stale_age_hours"] >= 0


def test_emit_stale_age_from_embedded_timestamp(tmp_path, monkeypatch, capsys):
    # the file is git-tracked, so mtime is checkout time on a fresh clone;
    # age must come from the measurement's own timestamp when present
    import time
    lg = tmp_path / "last_good.json"
    lg.write_text(json.dumps({"metric": "gmvae_train_seqs_per_sec_per_chip",
                              "value": 1.0,
                              "measured_at_unix": time.time() - 48 * 3600}))
    monkeypatch.setattr(bench, "LAST_GOOD", str(lg))
    bench._emit_stale("wedged")
    out = json.loads(capsys.readouterr().out.strip())
    assert 47.5 <= out["stale_age_hours"] <= 48.5
    assert "measured_at_unix" not in out


def test_emit_stale_families_shape(tmp_path, monkeypatch, capsys):
    """A failed --families run must emit a families-SHAPED error record,
    not the headline-shaped LAST_GOOD payload (whose metric a families
    consumer would misparse)."""
    lg = tmp_path / "last_good.json"
    lg.write_text(json.dumps({"metric": "gmvae_train_seqs_per_sec_per_chip",
                              "value": 24362.5}))
    monkeypatch.setattr(bench, "LAST_GOOD", str(lg))
    bench._emit_stale("timed out", families=True)
    out = json.loads(capsys.readouterr().out.strip())
    assert out["metric"] == "family_train_step_ms_median"
    assert out["value"] is None and out["families"] is None
    assert out["error"] == "timed out"


def test_last_json_line_picks_final_parseable():
    text = "\n".join([
        "# warmup chatter",
        '{"metric": "a", "value": 1}',
        "{not json",
        '{"metric": "b", "value": 2}',
        "# trailing note",
    ])
    assert json.loads(bench._last_json_line(text))["metric"] == "b"
    assert bench._last_json_line("no json here\n") is None


def test_analytic_flops_accounting():
    """benchmarks/flops.py sanity: family relations + a regression pin of
    the headline GM-VAE geometry (456.9 GFLOP/step, derivation in the
    module docstring / docs/kernels.md roofline section)."""
    from benchmarks.flops import train_step_flops
    from music_fader_nets_tpu.config import ModelConfig

    cfg = ModelConfig(num_clusters=2, seq_len=100, attr_len=16)
    f = {k: train_step_flops(cfg, k)
         for k in ("vanilla", "gmm", "glsr", "cvae", "fader", "singlevae")}
    # GMM prior work is not matmul FLOPs: gmm == vanilla under the rules
    assert f["gmm"] == f["vanilla"]
    # GLSR adds the 4B-row perturbation decode
    assert f["glsr"] > 2 * f["vanilla"]
    # CVAE pays a real dense input projection; fader (one-hot) does not
    assert f["cvae"] > f["fader"]
    # single-stream families are cheaper than the disentangled ones
    assert f["singlevae"] < f["vanilla"]
    assert abs(f["gmm"] - 456.9e9) / 456.9e9 < 0.01
    # scale check: FLOPs grow linearly in batch
    cfg2 = ModelConfig(num_clusters=2, seq_len=100, attr_len=16,
                       batch_size=256)
    assert abs(train_step_flops(cfg2, "gmm") - 2 * f["gmm"]) / f["gmm"] < 0.02
