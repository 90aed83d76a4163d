"""Profile the GM-VAE train step on the real chip and print a per-op
time breakdown (parsed from the XLA trace with jax.profiler.ProfileData —
no TensorBoard needed).

Usage: python -m benchmarks.profile_step [--dtype bfloat16] [--no-pallas]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--attr-len", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--top", type=int, default=28)
    ap.add_argument("--dump", action="store_true",
                    help="print plane/line structure instead of aggregating")
    ap.add_argument("--no-embed", action="store_true",
                    help="disable the embedded-token encoder kernel")
    ap.add_argument("--epoch", action="store_true",
                    help="trace the compiled-epoch program (bench.py's "
                         "path) instead of per-step dispatches")
    args = ap.parse_args()
    if args.no_embed:
        from music_fader_nets_tpu.ops import gru as gru_mod
        gru_mod._embed_kernel_dispatch = lambda B: (None, None)

    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu.data.datasets import YamahaDataset
    from music_fader_nets_tpu.data.synthetic import synth_corpus
    from music_fader_nets_tpu.models import init_reg_gmvae
    from music_fader_nets_tpu.train import Trainer
    from music_fader_nets_tpu.train.objectives import gmm_loss

    cfg = ModelConfig(num_clusters=2, batch_size=args.batch_size,
                      seq_len=args.seq_len, attr_len=args.attr_len,
                      dtype=args.dtype, use_pallas_gru=not args.no_pallas)
    yam = YamahaDataset(*synth_corpus(max(4 * args.batch_size, 512),
                                      args.seq_len, args.attr_len),
                        mode="train")
    tr = Trainer(cfg, init_reg_gmvae, {"default": gmm_loss})
    arrays = yam.arrays()

    # warm up (compile) outside the trace
    t = tr.steady_state_step_time(arrays, iters=4)
    print(f"steady-state step: {t * 1e3:.3f} ms "
          f"({args.batch_size / t:.0f} seq/s)", flush=True)

    from music_fader_nets_tpu.data.loader import batch_iterator
    batches = [b for b in batch_iterator(arrays, cfg.batch_size,
                                         shuffle=False)][:4]
    rng = tr.base_rng

    tmp = tempfile.mkdtemp(prefix="xla_trace_")
    if args.epoch:
        # trace the COMPILED-EPOCH program (lax.scan over stacked batches) —
        # the path bench.py and every trainer CLI actually time; per-step
        # overhead beyond the step program (batch slicing, metric stacking)
        # shows up only here
        stacked, nb = tr._stack_epoch(arrays, cfg.batch_size, False, 0)
        stacked = {k: v[: args.iters] for k, v in stacked.items()}
        nb = min(nb, args.iters)
        # device-resident batches, like the path being traced (bench.py /
        # Trainer.time_epoch place the epoch arrays before the timed call) —
        # otherwise each fn() re-transfers the epoch inside the trace window
        stacked = tr._place_stacked(stacked, nb, cfg.batch_size)
        key = ("default", True, nb, cfg.batch_size)
        if key not in tr._epoch_fns:
            tr._epoch_fns[key] = tr._build_epoch_fn(
                tr._loss_fns["default"], True)
        fn = tr._epoch_fns[key]
        tr.state, m = fn(tr.state, stacked, rng)          # compile + warm
        float(np.asarray(m["loss"]))
        jax.profiler.start_trace(tmp)
        tr.state, m = fn(tr.state, stacked, rng)
        sync = float(np.asarray(m["loss"]))
        jax.profiler.stop_trace()
        args.iters = nb
        print(f"traced one epoch program of {nb} steps (loss={sync:.3f})",
              flush=True)
    else:
        step_fn = tr._train_steps["default"]
        jax.profiler.start_trace(tmp)
        for i in range(args.iters):
            tr.state, m = step_fn(tr.state, batches[i % len(batches)], rng)
        sync = float(np.asarray(m["loss"]))  # block_until_ready lies
        jax.profiler.stop_trace()
        print(f"traced {args.iters} steps (loss={sync:.3f})", flush=True)

    files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    assert files, f"no xplane under {tmp}"
    pd = jax.profiler.ProfileData.from_file(files[0])
    if args.dump:
        for plane in pd.planes:
            print("plane:", plane.name)
            for line in plane.lines:
                evs = list(line.events)
                tot = sum(e.duration_ns for e in evs) / 1e6
                print(f"   line: {line.name!r}  events={len(evs)} "
                      f"total={tot:.3f}ms")
        return
    by_name = collections.defaultdict(float)
    total = 0.0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                mod = sum(e.duration_ns for e in line.events) / 1e6
                print(f"device module time: {mod / args.iters:.3f} ms/step",
                      flush=True)
        for line in plane.lines:
            # sync compute only: 'Async XLA Ops' are overlapped DMA
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                try:
                    for k, v in ev.stats:
                        if str(k) in ("tf_op", "provenance", "hlo_op") and v:
                            name = f"{v} [{str(ev.name).split(' = ')[0]}]"
                            break
                except Exception:
                    pass
                by_name[name] += dur
                total += dur
    if not by_name:
        # fallback: dump plane/line names to adapt
        for plane in pd.planes:
            print("plane:", plane.name)
            for line in plane.lines:
                n = sum(1 for _ in line.events)
                print("   line:", line.name, n)
        return

    per_step = total / args.iters
    print(f"\nTPU op time: {per_step:.3f} ms/step over {args.iters} steps; "
          f"top {args.top} ops:")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {ms / args.iters:8.4f} ms  {100 * ms / total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
