"""Sweep the backward kernels' time-block size kt on the real chip.

Times value+grad of each fused training kernel at bench shapes (B=128,
T=100, H=512, V=342) for forced kt values, by monkeypatching
`_pick_t_block`. kt=1 reproduces the per-step accumulation; larger kt
batches the dW/db accumulator updates over kt-step blocks.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.ops import pallas_gru
from benchmarks.kernel_lb_sweep import time_fn


def force_kt(kt, used):
    def fake(T, fits, **_kw):
        # still honor the kernel's VMEM feasibility model — forcing an
        # infeasible kt just OOMs scoped vmem at compile time
        got = kt if T % kt == 0 and fits(kt) else 1
        used.add(got)
        return got
    pallas_gru._pick_t_block = fake


def case_generic(L=2, T=100, B=128, H=512):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    pre = jax.random.normal(ks[0], (L, T, B, 3 * H)) * 0.1
    w = jax.random.normal(ks[1], (L, H, 3 * H)) * 0.05
    b = jax.random.normal(ks[2], (L, 3 * H)) * 0.05
    h0 = jax.random.normal(ks[3], (L, B, H)) * 0.1

    def loss(pre, w, b, h0):
        outs, hf = pallas_gru.stacked_gru_scan_pallas(pre, w, b, h0)
        return jnp.sum(outs) + jnp.sum(hf)

    return jax.value_and_grad(loss, argnums=(0, 1, 2, 3)), (pre, w, b, h0), 3


def case_embed(L=4, T=100, B=128, H=512, V=342):
    Vp = 384
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    tok = jax.random.randint(ks[0], (L, T, B), 0, V)
    wih = jax.random.normal(ks[1], (L, Vp, 3 * H)) * 0.05
    bih = jax.random.normal(ks[2], (L, 3 * H)) * 0.05
    whh = jax.random.normal(ks[3], (L, H, 3 * H)) * 0.05
    bhh = jax.random.normal(ks[4], (L, 3 * H)) * 0.05
    h0 = jax.random.normal(ks[5], (L, B, H)) * 0.1

    def loss(wih, bih, whh, bhh, h0):
        hf = pallas_gru.stacked_gru_embed_finals(tok, wih, bih, whh, bhh, h0)
        return jnp.sum(hf)

    return (jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)),
            (wih, bih, whh, bhh, h0), 4)


def case_dec(T=100, B=128, H=512, V=342):
    """Non-CE fused teacher decoder (GLSR/recon path): full log-probs out."""
    from music_fader_nets_tpu.models.modules import global_decoder_init
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    p = global_decoder_init(ks[0], 2 * 128 + 24, V, H)
    z = jax.random.normal(ks[1], (B, 2 * 128 + 24)) * 0.1
    tok = jax.random.randint(ks[2], (B, T), 0, V)

    def loss(p, z):
        h2 = pallas_gru.decoder_teacher_fused(p, z, tok, V)
        return jnp.sum(h2)

    return jax.value_and_grad(loss, argnums=(0, 1)), (p, z), 1


def case_dec_ce(T=100, B=128, H=512, V=342):
    from music_fader_nets_tpu.models.modules import global_decoder_init
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    p = global_decoder_init(ks[0], 2 * 128 + 24, V, H)
    z = jax.random.normal(ks[1], (B, 2 * 128 + 24)) * 0.1
    tok = jax.random.randint(ks[2], (B, T), 0, V)

    def loss(p, z):
        nll = pallas_gru.decoder_teacher_fused_nll(p, z, tok, V)
        return jnp.mean(nll)

    return jax.value_and_grad(loss, argnums=(0, 1)), (p, z), 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kts", default="1,2,4,5,10")
    ap.add_argument("--cases", default="generic,embed,dec,dec_ce")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    from music_fader_nets_tpu.train.cli import enable_compilation_cache
    enable_compilation_cache()

    orig = pallas_gru._pick_t_block
    cases = {"generic": case_generic, "embed": case_embed,
             "dec": case_dec, "dec_ce": case_dec_ce}
    try:
        for name in args.cases.split(","):
            fn, a, h0i = cases[name]()
            for kt in (int(x) for x in args.kts.split(",")):
                used = set()
                force_kt(kt, used)
                t = time_fn(fn, a, iters=args.iters, h0_idx=h0i)
                # a kernel may reject an indivisible/infeasible kt and fall
                # back to 1 — label the row with what actually ran
                actual = ",".join(str(k) for k in sorted(used)) or str(kt)
                note = "" if used in (set(), {kt}) else f"  (forced {kt})"
                print(f"{name:8s} kt={actual:>3s}: {t * 1e3:.3f} ms{note}",
                      flush=True)
    finally:
        pallas_gru._pick_t_block = orig


if __name__ == "__main__":
    main()
