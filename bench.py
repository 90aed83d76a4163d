"""Benchmark driver: GM-VAE training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "long_...": N}

The north-star metric (BASELINE.md) is sequences/sec/chip on GM-VAE
training at the "short" corpus geometry (T=100, 16 attribute steps,
reference ptb_v2.py:301). The same JSON line also carries the "long"
variant (T=250, 64 attribute steps, ptb_v2.py:303) as `long_*` keys.
`vs_baseline` is the speedup over the measured PyTorch baseline (the
reference publishes no numbers and is CUDA-only, so an equivalent
eager-PyTorch GM-VAE step is measured on this machine's CPU —
benchmarks/torch_baseline.py — and cached in benchmarks/baseline_cache.json).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(_HERE, "benchmarks", "baseline_cache.json")
# last successful bench result — the stale-fallback payload when the TPU
# tunnel is wedged (see run_guarded)
LAST_GOOD = os.path.join(_HERE, "log", "bench_last_good.json")


def measure_jax(batch_size: int, seq_len: int, attr_len: int, iters: int,
                dtype: str, decode: bool = True):
    import jax
    # persistent compilation cache: repeated bench runs skip the (slow,
    # tunneled) XLA compile entirely
    from music_fader_nets_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu.data import YamahaDataset
    from music_fader_nets_tpu.data.synthetic import synth_corpus
    from music_fader_nets_tpu.models import init_reg_gmvae
    from music_fader_nets_tpu.train import Trainer
    from music_fader_nets_tpu.train.objectives import gmm_loss

    # use_pallas_gru: fused whole-sequence GRU kernel with custom VJP —
    # the fastest single-chip training config
    from music_fader_nets_tpu.ops import pallas_gru
    pallas_gru.LAST_TRAIN_PATH = None      # worst-path-wins latch: reset
    cfg = ModelConfig(num_clusters=2, batch_size=batch_size, seq_len=seq_len,
                      attr_len=attr_len, dtype=dtype, use_pallas_gru=True)
    yam = YamahaDataset(*synth_corpus(max(4 * batch_size, 512), seq_len,
                                      attr_len), mode="train")
    tr = Trainer(cfg, init_reg_gmvae, {"default": gmm_loss})
    # compiled whole-epoch path (what the trainer CLIs run): no per-step
    # host dispatch, so the number reflects device throughput rather than
    # the tunnel's load-dependent RPC latency
    step_t, windows = tr.compiled_step_time(yam.arrays(), iters=iters,
                                            spread=True)
    if not decode:
        return batch_size / step_t, step_t, None, windows

    # secondary north-star: p50 arousal-transfer decode latency (B=1, 300
    # steps) through the VMEM-resident Pallas kernel
    import time
    import numpy as np
    from music_fader_nets_tpu.models.vae import _global_view
    from music_fader_nets_tpu.ops.pallas_decode import greedy_decode_tokens
    z0 = jax.random.normal(jax.random.PRNGKey(0), (1, 2 * cfg.z_dims + 24))

    # N chained decodes inside ONE compiled program (lax.scan carrying z
    # through a data dependency): zero per-decode dispatch, one host sync —
    # the single-window python-loop version drifted 1.8-2.7 ms run-to-run
    # with tunnel load even though the dispatches were chained on device
    N = 20

    def dec_chain(p, z):
        gview = _global_view(p)

        def body(z, _):
            toks = greedy_decode_tokens(gview, z, 300)
            return z + 1e-9 * toks.sum().astype(z.dtype), toks[0, 0]

        z, first_toks = jax.lax.scan(body, z, None, length=N)
        return z, first_toks

    dec_chain = jax.jit(dec_chain)
    z, first_toks = dec_chain(tr.params, z0)          # compile + warm
    _ = int(np.asarray(first_toks)[0])                # real sync
    per_dec = []
    for _w in range(3):
        t0 = time.perf_counter()
        z, first_toks = dec_chain(tr.params, z)
        _ = int(np.asarray(first_toks)[0])
        per_dec.append((time.perf_counter() - t0) / N)
    return batch_size / step_t, step_t, per_dec, windows


FAMILIES = ("vanilla", "gmm", "glsr", "cvae", "fader", "singlevae")


def measure_families(batch_size: int, seq_len: int, attr_len: int,
                     iters: int, dtype: str) -> dict:
    """On-chip compiled-epoch step time for ALL SIX model families
    (round-4 VERDICT next #1): one Trainer per family over the same
    synthetic Yamaha corpus, kernels requested everywhere. Returns
    {family: {step_ms_*, seqs_per_sec, tflops, mfu, train_path}}."""
    import statistics
    from music_fader_nets_tpu.train.cli import (
        MODEL_REGISTRY, enable_compilation_cache,
    )
    enable_compilation_cache()
    from benchmarks.flops import step_mfu, step_tflops
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu.data import YamahaDataset
    from music_fader_nets_tpu.data.synthetic import synth_corpus
    from music_fader_nets_tpu.ops import pallas_gru
    from music_fader_nets_tpu.train import Trainer

    yam = YamahaDataset(*synth_corpus(max(4 * batch_size, 512), seq_len,
                                      attr_len), mode="train")
    arrays = yam.arrays()
    out = {}
    for kind in FAMILIES:
        spec = MODEL_REGISTRY[kind]
        cfg = ModelConfig(num_clusters=2, batch_size=batch_size,
                          seq_len=seq_len, attr_len=attr_len, dtype=dtype,
                          use_pallas_gru=True)
        tr = Trainer(cfg, spec["init"],
                     {"default": spec["losses"]["default"]})
        pallas_gru.LAST_TRAIN_PATH = None
        step_t, windows = tr.compiled_step_time(arrays, iters=iters,
                                                spread=True)
        med = statistics.median(windows)
        out[kind] = {
            "step_ms_best": round(min(windows) * 1e3, 3),
            "step_ms_median": round(med * 1e3, 3),
            "seqs_per_sec": round(batch_size / med, 1),
            "tflops": round(step_tflops(cfg, med, kind), 1),
            "mfu": (round(step_mfu(cfg, med, kind), 3)
                    if dtype == "bfloat16" else None),
            "train_path": pallas_gru.LAST_TRAIN_PATH,
        }
        print(f"# {kind}: {out[kind]}", file=sys.stderr)
    return out


def measure_torch_baseline(batch_size: int, seq_len: int, attr_len: int,
                           refresh: bool):
    key = f"gmvae_b{batch_size}_t{seq_len}" + (
        f"_a{attr_len}" if attr_len != 16 else "")
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cache = json.load(f)
    if key in cache and not refresh:
        return cache[key]
    from benchmarks.torch_baseline import train_step_time
    t = train_step_time(batch_size=batch_size, seq_len=seq_len,
                        attr_len=attr_len, iters=3)
    cache[key] = batch_size / t
    os.makedirs(os.path.dirname(BASELINE_CACHE), exist_ok=True)
    with open(BASELINE_CACHE, "w") as f:
        json.dump(cache, f, indent=1)
    return cache[key]


def _emit_stale(reason: str, families: bool = False) -> None:
    """Print the last successful bench result flagged stale (or an explicit
    error line if none exists) — ONE parseable JSON line either way, so a
    wedged TPU tunnel at round end still leaves an honest record."""
    import time
    if families:
        # LAST_GOOD holds the HEADLINE-shaped record; emitting it for a
        # failed --families run would hand consumers an unrelated metric
        print(json.dumps({"metric": "family_train_step_ms_median",
                          "value": None, "unit": "ms", "families": None,
                          "error": reason}))
        return
    if os.path.exists(LAST_GOOD):
        with open(LAST_GOOD) as f:
            result = json.load(f)
        # age from the measurement's own timestamp: the file is git-tracked,
        # so its mtime is just the checkout time on a fresh clone
        since = result.pop("measured_at_unix", None) or os.path.getmtime(LAST_GOOD)
        age_h = (time.time() - since) / 3600
        result["stale"] = True
        result["stale_reason"] = reason
        result["stale_age_hours"] = round(age_h, 1)
    else:
        result = {"metric": "gmvae_train_seqs_per_sec_per_chip",
                  "value": None, "unit": "seq/s", "vs_baseline": None,
                  "error": reason}
    print(json.dumps(result))


def run_guarded(argv, max_wait: float, families: bool = False) -> int:
    """Run the real measurement as a child process with a wall-clock bound.

    The axon TPU tunnel has twice wedged so hard that backend init hangs for
    hours (or crashes after ~26 min). If that happens during the driver's
    round-end bench run, an unguarded bench.py records nothing. The guard
    never kills the child on timeout — SIGTERM/SIGKILL mid-TPU-RPC is what
    wedges the tunnel in the first place (CLAUDE.md) — it abandons it (the
    child still writes LAST_GOOD if it eventually succeeds) and emits the
    last-good result flagged stale."""
    import subprocess
    out_path = os.path.join(_HERE, "log", "bench_child_last.out")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as out:
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--no-guard"] + argv,
            stdout=out, stderr=sys.stderr, cwd=_HERE)
    try:
        rc = child.wait(timeout=max_wait)
    except subprocess.TimeoutExpired:
        _emit_stale(f"bench timed out after {max_wait:.0f}s "
                    "(TPU tunnel wedged?); child abandoned, not killed",
                    families)
        return 0
    if rc == 0:
        with open(out_path) as f:
            line = _last_json_line(f.read())
        if line is not None:
            print(line)
            return 0
    _emit_stale(f"bench child exited rc={rc} with no JSON line", families)
    return 0


def _last_json_line(text: str):
    """Last stdout line that parses as a JSON object, or None."""
    for ln in reversed(text.splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                json.loads(ln)
                return ln
            except ValueError:
                continue
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--attr-len", type=int, default=16)
    ap.add_argument("--iters", type=int, default=100)
    # bf16 mixed precision (f32 master weights / f32 losses) is the fastest
    # validated training mode — the headline config; --dtype float32 for the
    # parity-comparable number (see README perf table for both)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--refresh-baseline", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-long", action="store_true",
                    help="measure only the short (T=100) variant")
    ap.add_argument("--no-guard", action="store_true",
                    help="measure in-process (no wedge watchdog)")
    ap.add_argument("--max-wait", type=float, default=None,
                    help="guard wall-clock bound, seconds; default 2700 "
                         "(5400 with --families) covers cold Mosaic "
                         "compiles of every measured program")
    ap.add_argument("--families", action="store_true",
                    help="measure the compiled step time of ALL SIX model "
                         "families instead of the headline GM-VAE number")
    args = ap.parse_args()
    if not args.no_guard:
        argv = [a for a in sys.argv[1:] if a != "--no-guard"]
        wait = args.max_wait
        if wait is None:         # six families may all cold-compile
            wait = 5400.0 if args.families else 2700.0
        sys.exit(run_guarded(argv, wait, args.families))

    if args.families:
        fams = measure_families(args.batch_size, args.seq_len,
                                args.attr_len, args.iters, args.dtype)
        print(json.dumps({
            "metric": "family_train_step_ms_median",
            "value": fams["gmm"]["step_ms_median"],
            "unit": "ms", "dtype": args.dtype,
            "batch_size": args.batch_size, "seq_len": args.seq_len,
            "families": fams,
        }))
        return

    seqs_per_sec, step_t, decode_windows, windows = measure_jax(
        args.batch_size, args.seq_len, args.attr_len, args.iters, args.dtype)
    baseline = None if args.skip_baseline else measure_torch_baseline(
        args.batch_size, args.seq_len, args.attr_len, args.refresh_baseline)

    import statistics
    # analytic roofline fields (benchmarks/flops.py): tflops = achieved
    # matmul FLOPs/s under the documented counting rules; mfu against the
    # v5e bf16 peak (bf16 runs only — f32 matmuls lower to multi-pass MXU
    # ops with no single defensible peak). These are the primary perf
    # claims; vs_baseline (1-core eager-torch CPU, the only reference
    # implementation this box can run) is kept as a secondary field.
    from benchmarks.flops import step_mfu, step_tflops
    from music_fader_nets_tpu.config import ModelConfig as _MC
    _cfg = _MC(batch_size=args.batch_size, seq_len=args.seq_len,
               attr_len=args.attr_len)
    med_t = statistics.median(windows)
    # `value` derives from the MEDIAN timing window (round 5; previously
    # the best window) so the headline, tflops/mfu, and --families rows
    # all imply the same step time; the best window stays visible as
    # step_ms_best. Median vs best differ <0.5% on a healthy tunnel.
    med_sps = args.batch_size / med_t
    result = {
        "metric": "gmvae_train_seqs_per_sec_per_chip",
        "value": round(med_sps, 1),
        "unit": "seq/s",
        "tflops": round(step_tflops(_cfg, med_t, "gmm"), 1),
        "mfu": (round(step_mfu(_cfg, med_t, "gmm"), 3)
                if args.dtype == "bfloat16" else None),
        "vs_baseline": round(med_sps / baseline, 2) if baseline else None,
        "dtype": args.dtype,
        # best/median/worst of the 3 timing windows: makes perf-delta claims
        # falsifiable against the measured noise floor
        "step_ms_best": round(min(windows) * 1e3, 3),
        "step_ms_median": round(statistics.median(windows) * 1e3, 3),
        "step_ms_worst": round(max(windows) * 1e3, 3),
        # secondary north-star (BASELINE.md): B=1 300-step transfer decode.
        # p50 = median of the 3 timing windows (each a mean over 20 chained
        # decodes); best also reported — don't compare best vs p50 across runs
        "decode300_p50_ms": (round(statistics.median(decode_windows) * 1e3, 2)
                             if decode_windows is not None else None),
        "decode300_ms_best": (round(min(decode_windows) * 1e3, 2)
                              if decode_windows is not None else None),
    }
    # which paths served the numbers — a kernel regression must not
    # silently demote the headline to the scan (ops/pallas_decode.py,
    # ops/pallas_gru.LAST_TRAIN_PATH)
    from music_fader_nets_tpu.ops import pallas_decode, pallas_gru
    result["decode_path"] = pallas_decode.LAST_DECODE_PATH
    result["train_path"] = pallas_gru.LAST_TRAIN_PATH
    if pallas_decode.LAST_DECODE_PATH != "kernel":
        print(f"# WARNING: decode served by "
              f"{pallas_decode.LAST_DECODE_PATH!r}, not the pallas kernel",
              file=sys.stderr)
    if pallas_gru.LAST_TRAIN_PATH not in ("kernel-single", "kernel-dp"):
        print(f"# WARNING: training recurrences served by "
              f"{pallas_gru.LAST_TRAIN_PATH!r}, not the pallas kernels",
              file=sys.stderr)

    long_note = ""
    if not args.skip_long:
        # long corpus variant: 64-step / <=250-token segments (ptb_v2.py:303)
        l_sps, l_step_t, _, l_windows = measure_jax(
            args.batch_size, 250, 64, args.iters, args.dtype, decode=False)
        l_base = None if args.skip_baseline else measure_torch_baseline(
            args.batch_size, 250, 64, args.refresh_baseline)
        l_med = statistics.median(l_windows)
        l_med_sps = args.batch_size / l_med
        result["long_seqs_per_sec"] = round(l_med_sps, 1)
        result["long_step_ms_median"] = round(l_med * 1e3, 3)
        result["long_vs_baseline"] = (round(l_med_sps / l_base, 2)
                                      if l_base else None)
        long_note = (f"; long T=250 step={l_step_t * 1e3:.2f}ms "
                     f"({l_sps:.1f} seq/s, torch-cpu {l_base and round(l_base, 1)})")

    print(json.dumps(result))
    # record for the stale-fallback path (run_guarded); only the default
    # configuration is the driver's headline number
    if (args.batch_size, args.seq_len, args.dtype) == (128, 100, "bfloat16"):
        import time
        os.makedirs(os.path.dirname(LAST_GOOD), exist_ok=True)
        with open(LAST_GOOD, "w") as f:
            json.dump({**result, "measured_at_unix": round(time.time())}, f)
            f.write("\n")
    print(f"# step={step_t * 1e3:.2f}ms B={args.batch_size} T={args.seq_len} "
          f"dtype={args.dtype}; p50 300-step B=1 decode="
          f"{result['decode300_p50_ms']}ms (pallas); torch-cpu baseline="
          f"{baseline and round(baseline, 1)} seq/s" + long_note,
          file=sys.stderr)


if __name__ == "__main__":
    main()
