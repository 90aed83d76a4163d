"""Measure the eval decode crossover (VERDICT r2 weak #6): a 160-row eval
wave (20 samples x 8 slider values, the gmm/vanilla workload) decoded as
3 x 64-row Pallas kernel chunks vs ONE 160-row XLA-scan argmax decode.
Decides eval/controllability.py::ControllabilityEvaluator._CHUNK policy.
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=160)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    from music_fader_nets_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()

    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.models.gmvae import _global_view
    from music_fader_nets_tpu.ops.pallas_decode import pallas_greedy_decode

    cfg = ModelConfig(num_clusters=2)
    params = models.init_reg_gmvae(jax.random.PRNGKey(0), cfg)
    M = args.rows
    zt = 2 * cfg.z_dims + 24
    z = jax.random.normal(jax.random.PRNGKey(1), (M, zt)) * 0.3
    steps = args.steps

    def timed(fn, z_in):
        """Chain iterations through a scalar into z; one fetch at the end."""
        @jax.jit
        def g(c, z_in):
            def body(c, _):
                toks = fn(z_in + c.astype(z_in.dtype) * 1e-30)
                return jnp.float32(toks.sum()) * jnp.float32(1e-30), ()
            return jax.lax.scan(body, c, None, length=args.iters)[0]
        float(np.asarray(g(jnp.float32(0.0), z_in)))      # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(g(jnp.float32(0.0), z_in)))
        return (time.perf_counter() - t0) / args.iters

    # (a) chunked Pallas kernel: 64-row chunks (eval's current policy)
    def chunked(z_in):
        outs = []
        for s in range(0, M, 64):
            chunk = z_in[s: s + 64]
            pad = 64 - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, zt), chunk.dtype)])
            outs.append(models.reg_gmvae_decode_tokens(params, chunk, steps))
        return jnp.concatenate(outs)

    # (b) one XLA-scan argmax decode over all rows
    def scan_all(z_in):
        logp = models.reg_gmvae_global_decode(params, z_in, steps)
        return jnp.argmax(logp, axis=-1)

    # (c) one Pallas kernel launch over all rows (if it fits). NB: must call
    # pallas_greedy_decode directly — greedy_decode_tokens silently falls
    # back to the XLA scan for >64 rows, which would turn this arm into a
    # second measurement of (b).
    def kernel_all(z_in):
        return pallas_greedy_decode(_global_view(params), z_in, steps)

    for name, fn in (("chunked64_pallas", chunked),
                     ("scan_one_call", scan_all),
                     ("pallas_one_call", kernel_all)):
        try:
            t = timed(fn, z)
            print(f"{name:18s} M={M} steps={steps}: {t * 1e3:.3f} ms",
                  flush=True)
        except Exception as e:           # e.g. VMEM overflow at large M
            print(f"{name:18s} M={M}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
