"""Decompose the GM-VAE train-step time into components on the real chip.

Times (fwd and fwd+grad, on-device chained so tunnel dispatch latency is
excluded): full gmm_loss step incl. Adam, loss forward only, encoder,
sub-decoder pair, teacher decoder, and the optimizer update alone.
Guides kernel work: run after any compute-path change.
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, args, iters=20, static_args=()):
    """Per-call device seconds. Iterations chained on-device through a
    scalar folded into the FIRST float-array argument; every output leaf is
    touched so nothing is dead-code-eliminated."""

    def body(a, c, _):
        a = list(a)
        for i, x in enumerate(a):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                a[i] = x + c.astype(x.dtype)
                break
        out = fn(*a, *static_args)
        s = sum(leaf.ravel()[0].astype(jnp.float32)
                for leaf in jax.tree_util.tree_leaves(out)
                if jnp.issubdtype(leaf.dtype, jnp.floating))
        return s * jnp.float32(1e-30), ()

    @jax.jit
    def g(z, *a):
        return jax.lax.scan(lambda c, x: body(a, c, x), z,
                            None, length=iters)[0]

    z0 = jnp.float32(0.0)
    float(np.asarray(g(z0, *args)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(g(z0, *args)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=100)
    ap.add_argument("--attr-len", type=int, default=16)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--no-pallas", action="store_true")
    args = ap.parse_args()

    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu.models import init_reg_gmvae
    from music_fader_nets_tpu.models import vae as vae_mod
    from music_fader_nets_tpu.models.modules import (
        global_decoder_teacher, sub_decoder_pair_apply)
    from music_fader_nets_tpu.models.vae import (
        _enc_view, _global_view, _sub_view, reg_vae_encode)
    from music_fader_nets_tpu.train.objectives import gmm_loss
    from music_fader_nets_tpu.train.trainer import make_optimizer

    cfg = ModelConfig(num_clusters=2, batch_size=args.batch_size,
                      seq_len=args.seq_len, attr_len=args.attr_len,
                      dtype=args.dtype,
                      use_pallas_gru=not args.no_pallas)
    B, T, A = args.batch_size, args.seq_len, args.attr_len
    key = jax.random.PRNGKey(0)
    params = init_reg_gmvae(key, cfg)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)

    ks = jax.random.split(key, 8)
    batch = {
        "x": jax.random.randint(ks[0], (B, T), 0, cfg.roll_dims),
        "r": jax.random.randint(ks[1], (B, A), 0, cfg.rhythm_dims),
        "n": jax.random.randint(ks[2], (B, A), 0, cfg.note_dims),
        "c": jax.random.normal(ks[3], (B, cfg.chroma_dims)),
        "r_density": jax.random.uniform(ks[4], (B,)),
        "n_density": jax.random.uniform(ks[5], (B,)),
    }
    rng = ks[6]
    step = jnp.zeros((), jnp.int32)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    x_oh = jax.nn.one_hot(batch["x"], cfg.roll_dims, dtype=dt)
    r_oh = jax.nn.one_hot(batch["r"], cfg.rhythm_dims, dtype=dt)
    n_oh = jax.nn.one_hot(batch["n"], cfg.note_dims, dtype=dt)
    pdt = jax.tree_util.tree_map(lambda x: x.astype(dt) if
                                 jnp.issubdtype(x.dtype, jnp.floating) else x,
                                 params)
    z = jax.random.normal(ks[7], (B, 2 * cfg.z_dims + cfg.chroma_dims), dt)

    rows = []

    def report(name, t):
        rows.append((name, t))
        print(f"{name:34s} {t * 1e3:8.3f} ms", flush=True)

    # --- full train step (loss + grads + clip + adam) ---
    def train_step(params, opt_state, x):
        def lossf(p):
            return gmm_loss(p, rng, dict(batch, c=x), step, cfg)
        (l, m), grads = jax.value_and_grad(lossf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state, l

    report("train step (loss+grad+adam)",
           chain_time(lambda x, p, o: train_step(p, o, x),
                      (batch["c"], params, opt_state), args.iters))

    # --- loss forward only ---
    report("loss forward",
           chain_time(lambda x, p: gmm_loss(p, rng, dict(batch, c=x),
                                            step, cfg)[0],
                      (batch["c"], params), args.iters))

    # --- encoder (L=4 fused bi-GRU) ---
    enc = functools.partial(reg_vae_encode, use_pallas=cfg.use_pallas_gru)
    report("encoder fwd",
           chain_time(lambda xo, p: enc(p, xo), (x_oh, pdt), args.iters))
    report("encoder fwd+grad",
           chain_time(jax.grad(lambda xo, p:
                               sum(jnp.sum(t.astype(jnp.float32))
                                   for pair in enc(p, xo) for t in pair),
                               argnums=(0, 1)),
                      (x_oh, pdt), args.iters))

    # --- sub-decoder pair (L=2, T=attr_len) ---
    def sub(p, zr, zn):
        return sub_decoder_pair_apply(
            _sub_view(p, "r"), _sub_view(p, "n"), r_oh, n_oh, zr, zn,
            use_pallas=cfg.use_pallas_gru)

    zr = z[:, :cfg.z_dims]
    zn = z[:, cfg.z_dims:2 * cfg.z_dims]
    report("sub-decoders fwd",
           chain_time(lambda zr, p: sub(p, zr, zn), (zr, pdt), args.iters))

    # --- global teacher decoder (two L=1 scans, T=seq_len) ---
    def dec(p, z):
        return global_decoder_teacher(_global_view(p), z, x_oh,
                                      use_pallas=cfg.use_pallas_gru)

    report("teacher decoder fwd",
           chain_time(lambda z, p: dec(p, z), (z, pdt), args.iters))
    report("teacher decoder fwd+grad",
           chain_time(jax.grad(lambda z, p: jnp.sum(dec(p, z)),
                               argnums=(0, 1)), (z, pdt), args.iters))

    # --- optimizer alone (grads := params as a stand-in tree) ---
    def adam_only(g, o):
        updates, o = opt.update(g, o, params)
        return updates

    report("clip+adam update alone",
           chain_time(lambda g, o: adam_only(g, o), (params, opt_state),
                      args.iters))

    total = dict(rows)
    acc = (total["encoder fwd+grad"] + total["teacher decoder fwd+grad"]
           + total["clip+adam update alone"])
    print(f"\n# accounted (enc+dec grads + adam): {acc * 1e3:.3f} ms of "
          f"{total['train step (loss+grad+adam)'] * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
