"""Sweep the Pallas GRU kernel's L-block choice on the real chip.

Times forward-only (per fwd l_block) and forward+grad (per bwd l_block,
fwd fixed) at the encoder bench shapes (L=6, T=100, B=128, H=512), f32
and bf16, by monkeypatching `_pick_l_block`. Used to pick the production
block policy (VERDICT round-1 items 4/5).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.ops import pallas_gru


def time_fn(fn, args, iters=30, h0_idx=3):
    """Device time per call: iterations are chained ON-DEVICE through a
    scalar data dependency into h0 (one dispatch, one 4-byte fetch) —
    per-call RPC overhead through the axon tunnel is ~14ms and would
    otherwise swamp the kernel."""
    import numpy as np

    def body(a, c, _):
        a = list(a)
        a[h0_idx] = a[h0_idx] + c.astype(a[h0_idx].dtype)
        out = fn(*a)
        # touch EVERY output leaf: an unused output (e.g. the grads) would
        # otherwise be dead-code-eliminated out of the timed loop entirely
        s = sum(leaf.ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out))
        return s * jnp.float32(1e-30), ()

    # NB args must be jit PARAMETERS: closed-over device arrays are inlined
    # into the HLO as constants (here ~0.5GB) and the compile crawls
    @jax.jit
    def g(z, *a):
        return jax.lax.scan(lambda c, x: body(a, c, x), z,
                            None, length=iters)[0]

    z0 = jnp.float32(0.0)
    float(np.asarray(g(z0, *args)))          # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(g(z0, *args)))
    return (time.perf_counter() - t0) / iters


def with_blocks(fwd_lb, bwd_lb):
    """Pin the forward l-block and the backward l-block (the backward keeps
    its production kt choice — sweep that with benchmarks/kt_sweep.py).
    Returns the two originals for the caller's finally-restore."""
    orig_fwd = pallas_gru._pick_l_block
    orig_bwd = pallas_gru._pick_bwd_blocks

    def fake_fwd(Lk, Bk, Hk, Gk, isz):
        return fwd_lb

    def fake_bwd(Lk, Tk, Bk, Hk, Gk, isz):
        return bwd_lb, orig_bwd(Lk, Tk, Bk, Hk, Gk, isz)[1]
    pallas_gru._pick_l_block = fake_fwd
    pallas_gru._pick_bwd_blocks = fake_bwd
    return orig_fwd, orig_bwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=6)
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--H", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    args = ap.parse_args()
    L, T, B, H = args.L, args.T, args.B, args.H
    G = 3 * H
    divisors = [d for d in range(1, L + 1) if L % d == 0]

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    for dname in args.dtypes.split(","):
        dtype = jnp.dtype(dname).type
        pre = jax.random.normal(ks[0], (L, T, B, G), dtype)
        w = jax.random.normal(ks[1], (L, H, G), dtype) * 0.04
        b = jax.random.normal(ks[2], (L, G), dtype) * 0.04
        h0 = jnp.zeros((L, B, H), dtype)

        def loss(pre, w, b, h0):
            h = pallas_gru.stacked_gru_pallas(pre, w, b, h0)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        # --- forward sweep ---
        best_fwd, best_t = None, float("inf")
        for lb in divisors:
            orig_fwd, orig_bwd = with_blocks(lb, 1)
            try:
                tf = time_fn(jax.jit(pallas_gru.stacked_gru_pallas),
                             (pre, w, b, h0), args.iters)
                print(f"{dname:9s} fwd lb={lb}  {tf*1e3:7.3f}ms", flush=True)
                if tf < best_t:
                    best_fwd, best_t = lb, tf
            except Exception as e:
                print(f"{dname:9s} fwd lb={lb}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            finally:
                pallas_gru._pick_l_block = orig_fwd
                pallas_gru._pick_bwd_blocks = orig_bwd

        # --- backward l-block sweep (fwd fixed at best, production kt) ---
        if best_fwd is None:
            print(f"{dname:9s} every forward lb candidate failed; "
                  "skipping the backward sweep", flush=True)
            continue
        for lb in divisors:
            orig_fwd, orig_bwd = with_blocks(best_fwd, lb)
            try:
                f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
                t = time_fn(f, (pre, w, b, h0), args.iters)
                print(f"{dname:9s} fwd lb={best_fwd} bwd lb={lb}  "
                      f"fwd+grad={t*1e3:7.3f}ms", flush=True)
            except Exception as e:
                print(f"{dname:9s} bwd lb={lb}  FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)
            finally:
                pallas_gru._pick_l_block = orig_fwd
                pallas_gru._pick_bwd_blocks = orig_bwd


if __name__ == "__main__":
    main()
