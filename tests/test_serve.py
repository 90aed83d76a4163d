"""Serving subsystem: micro-batching correctness, padding invariance,
request validation, and the JSON-lines CLI protocol (CPU, scan path —
the kernel path shares the decode op already pinned kernel==scan in
test_pallas_decode.py)."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.models.gmvae import init_reg_gmvae
from music_fader_nets_tpu.models.vae import init_reg_vae, reg_vae_encode
from music_fader_nets_tpu.ops.pallas_decode import greedy_decode_tokens
from music_fader_nets_tpu.models.vae import _global_view
from music_fader_nets_tpu.serve import TransferServer
from music_fader_nets_tpu.transfer.arousal import compute_shift_vectors

CFG = ModelConfig(hidden_dims=48, z_dims=16, seq_len=24, attr_len=8,
                  num_clusters=2)
STEPS = 12


@pytest.fixture(scope="module")
def gmm_params():
    return init_reg_gmvae(jax.random.PRNGKey(3), CFG)


@pytest.fixture(scope="module")
def gmm_server(gmm_params):
    with TransferServer(gmm_params, CFG, steps=STEPS, max_batch=4,
                        max_wait_ms=200.0, use_pallas=False) as srv:
        yield srv


def _req(i, rng, direction="low_to_high", **kw):
    tokens = rng.integers(2, CFG.roll_dims, size=CFG.seq_len).tolist()
    return {"id": i, "tokens": tokens, "direction": direction,
            "lam": 0.7, "return_z": True, **kw}


def _expected(params, req):
    """Direct single-row reference computation of the serve step
    (mean-z path): encode -> shift -> greedy decode."""
    tokens = jnp.asarray(req["tokens"], jnp.int32)[None]
    x_oh = jax.nn.one_hot(tokens, CFG.roll_dims, dtype=jnp.float32)
    (mu_r, _), (mu_n, _) = reg_vae_encode(params, x_oh)
    shifts = compute_shift_vectors(params)
    z_r = mu_r + req["lam"] * shifts[f"r_{req['direction']}"]
    z_n = mu_n + req["lam"] * shifts[f"n_{req['direction']}"]
    z = jnp.concatenate(
        [z_r, z_n, jnp.zeros((1, CFG.chroma_dims), z_r.dtype)], axis=-1)
    toks = greedy_decode_tokens(_global_view(params), z, STEPS,
                                use_pallas=False)
    return np.asarray(z)[0], np.asarray(toks)[0]


def test_batched_matches_direct_and_pads_invariantly(gmm_server, gmm_params):
    """Three concurrent requests coalesce into one padded fixed-shape batch
    whose per-row results equal the direct single-row path — padding rows
    and batch position must not leak into results."""
    rng = np.random.default_rng(0)
    reqs = [_req(i, rng) for i in range(3)]
    futs = [gmm_server.submit(r) for r in reqs]
    resps = [f.result(timeout=120) for f in futs]
    for req, resp in zip(reqs, resps):
        assert "error" not in resp, resp
        z_exp, tok_exp = _expected(gmm_params, req)
        np.testing.assert_allclose(np.asarray(resp["z"]), z_exp,
                                   rtol=0, atol=5e-5)
        assert resp["tokens"] == tok_exp.tolist()
        assert len(resp["tokens"]) == STEPS
    # all three rode one device program launch
    assert all(r["batch_rows"] == 3 for r in resps)
    st = gmm_server.stats()
    assert st["batches"] >= 1 and st["requests"] >= 3
    assert st["serving_path"] == "scan"   # CPU
    assert st["mean_batch_rows"] >= 1


def test_seeded_rows_reproducible(gmm_server):
    rng = np.random.default_rng(1)
    req = _req(0, rng, seed=1234)
    z1 = gmm_server.request(req)["z"]
    z2 = gmm_server.request(dict(req))["z"]
    assert z1 == z2
    z_mean = gmm_server.request({**req, "seed": None})["z"]
    assert z1 != z_mean            # sampled z differs from the mean path


def test_temperature_sampling_rows(gmm_server):
    """Per-row temperature: a mixed batch serves greedy rows exactly as
    the all-greedy program would, sampled rows are reproducible per seed
    and vary without one, and negative temperatures reject."""
    import concurrent.futures as cf
    rng = np.random.default_rng(5)
    greedy = _req(0, rng)
    s_rng = np.random.default_rng(6)
    sampled = _req(1, s_rng, temperature=0.9, seed=77)

    base = gmm_server.request(dict(greedy))          # all-greedy batch
    # submit together so both land in ONE (sampled-program) batch; retry
    # on timing skew so the greedy-equivalence claim is actually exercised
    for _attempt in range(5):
        futs = [gmm_server.submit(dict(greedy)),
                gmm_server.submit(dict(sampled))]
        got_g, got_s = [f.result() for f in futs]
        if got_g["batch_rows"] == 2:
            break
    assert got_g["batch_rows"] == 2, "requests never coalesced"
    # exact on CPU (deterministic XLA); on TPU at default matmul
    # precision the two separately-compiled programs can flip
    # near-tie argmaxes (documented in serve/server.py)
    assert got_g["tokens"] == base["tokens"]
    # reproducible per seed (batched alone or not)
    rep = gmm_server.request(dict(sampled))
    assert rep["tokens"] == got_s["tokens"]
    # no seed -> server nonce -> streams differ
    free = {**sampled, "seed": None}
    a = gmm_server.request(dict(free))
    b = gmm_server.request(dict(free))
    assert a["tokens"] != b["tokens"]
    # sampled output stays in-vocab
    toks = np.asarray(got_s["tokens"])
    assert toks.min() >= 0 and toks.max() < CFG.roll_dims

    before = gmm_server.stats()["rejected"]
    bad = ({"tokens": [1, 2], "temperature": -0.5},
           {"tokens": [1, 2], "temperature": float("nan")},
           {"tokens": [1, 2], "temperature": float("inf")},
           # beyond float32 1/T bounds: inv_t would underflow to 0 and the
           # -1e30 pad-lane bias would tie with real lanes -> out-of-vocab
           {"tokens": [1, 2], "temperature": 1e300},
           {"tokens": [1, 2], "temperature": 1e-30},
           # negative seed would crash default_rng at LAUNCH, failing the
           # whole co-batched group — must reject at validation
           {"tokens": [1, 2], "seed": -7})
    for b in bad:
        assert "error" in gmm_server.request(b), b
    assert gmm_server.stats()["rejected"] == before + len(bad)


def test_steps_truncation_and_validation(gmm_server):
    rng = np.random.default_rng(2)
    resp = gmm_server.request(_req(0, rng, steps=5))
    assert len(resp["tokens"]) == 5
    before = gmm_server.stats()["rejected"]
    bad_reqs = ({"tokens": []},
                {"tokens": [1, 2], "direction": "sideways"},
                {"tokens": [1, 2], "steps": STEPS + 1},
                {"tokens": [1, 2], "steps": 0},
                {"tokens": [999999]},
                {"tokens": [2 ** 40]},          # OverflowError path (np>=2)
                {"tokens": [1] * (CFG.seq_len + 1)},   # over-long: loud
                {"tokens": [1, 2], "chroma": [0.0] * 3},
                [1, 2, 3],                      # non-dict request
                "nonsense")
    for bad in bad_reqs:
        assert "error" in gmm_server.request(bad)
    assert gmm_server.stats()["rejected"] == before + len(bad_reqs)


def test_vanilla_checkpoint_is_reconstruct_only():
    params = init_reg_vae(jax.random.PRNGKey(5), CFG)
    with TransferServer(params, CFG, steps=STEPS, max_batch=2,
                        max_wait_ms=1.0, use_pallas=False) as srv:
        rng = np.random.default_rng(3)
        ok = srv.request(_req(0, rng, direction="none"))
        assert "error" not in ok and len(ok["tokens"]) == STEPS
        bad = srv.request(_req(1, rng, direction="low_to_high"))
        assert "mixture tables" in bad["error"]


def test_submit_after_close(gmm_params):
    srv = TransferServer(gmm_params, CFG, steps=STEPS, max_batch=2,
                         max_wait_ms=1.0, use_pallas=False)
    srv.close()
    assert srv.request({"tokens": [1, 2]})["error"] == "server closed"


def test_cli_tcp_protocol(tmp_path):
    """TCP transport: ephemeral port, two concurrent connections, stats op."""
    import socket
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps({
        "hidden_dims": 48, "z_dims": 16, "seq_len": 24, "attr_len": 8,
        "batch_size": 4, "num_clusters": 2}))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "serve.py", "--kind", "gmm", "--random-init",
         "--platform", "cpu", "--no-pallas", "--config", str(cfg_path),
         "--steps", str(STEPS), "--max-batch", "4", "--max-wait-ms", "20",
         "--tcp", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        line = proc.stdout.readline()       # "serving on 127.0.0.1:PORT"
        assert "serving on" in line, line
        port = int(line.strip().rsplit(":", 1)[1])
        rng = np.random.default_rng(5)

        def roundtrip(req):
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=120) as s:
                f = s.makefile("rw")
                f.write(json.dumps(req) + "\n")
                f.flush()
                return json.loads(f.readline())

        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(2) as ex:
            rs = list(ex.map(roundtrip,
                             [_req(i, rng, return_z=False)
                              for i in range(2)]))
        for r in rs:
            assert "error" not in r and len(r["tokens"]) == STEPS
        assert roundtrip({"op": "stats"})["requests"] == 2
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_cli_stdin_protocol(tmp_path):
    """End-to-end protocol smoke: serve.py over stdin with tiny dims,
    random init, scan path. Covers request pipelining, the stats op and
    ordered responses."""
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps({
        "hidden_dims": 48, "z_dims": 16, "seq_len": 24, "attr_len": 8,
        "batch_size": 4, "num_clusters": 2}))
    rng = np.random.default_rng(4)
    lines = [json.dumps(_req(i, rng, return_z=False)) for i in range(3)]
    lines.append("42")            # valid JSON, not an object: error, no crash
    lines.append("{not json")     # invalid JSON: error, no crash
    lines.append(json.dumps({"op": "stats"}))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "serve.py", "--kind", "gmm", "--random-init",
         "--platform", "cpu", "--no-pallas", "--config", str(cfg_path),
         "--steps", str(STEPS), "--max-batch", "4", "--max-wait-ms", "50"],
        input="\n".join(lines) + "\n", capture_output=True, text=True,
        timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]
    resps = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(resps) == 6
    for i, r in enumerate(resps[:3]):
        assert r["id"] == i, resps           # responses in request order
        assert "error" not in r
        assert len(r["tokens"]) == STEPS
    assert "error" in resps[3]               # non-object JSON
    assert "error" in resps[4]               # unparsable line
    assert resps[5]["requests"] == 3         # the stats op
