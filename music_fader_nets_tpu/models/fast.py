"""Kernel-layout parameter views ("fast params").

The canonical param pytree keeps the reference's per-layer attribute names
verbatim (models/vae.py) — that layout is the `.pt`-converter and
checkpoint contract. But the TPU training kernels consume *stacked* weights
((L, I, 3H) encoder direction stacks, (2, D+Z, 3H) sub-decoder pairs, a
vocab-padded decoder token projection), and assembling those from the
per-layer leaves inside the jitted step re-runs the stack/pad fusions and
their backward unstack slices EVERY step — ~0.2 ms/step of pure HBM traffic
at reference dims (measured, benchmarks/profile_step.py round 4).

`split_fast` converts canonical -> kernel layout once; `merge_canonical`
inverts it exactly (pure stack/pad <-> slice/unstack, no arithmetic). The
Trainer converts at the jit boundary: per-epoch for the compiled-epoch
path (the win — the scan carries kernel-layout params and Adam runs on
them directly), per-step inside the loss for the streaming path (same cost
profile as the old in-forward stacking).

`split_fast` also drops the reference's parity-only, never-exercised
layers (`gru_c`, `gru_d_c`, `linear_init_c`, `linear_out_c`, `c_r`, `c_n`
— SURVEY.md §2.3) from the carried tree: their grads are identically zero,
and PyTorch's Adam likewise skips them (their `.grad` stays None in the
reference, so its optimizer never touches them — reference trainer.py:49).
They ride along as untouched constants and are reattached by
`merge_canonical`.

Fast-layout groups (keys absent from canonical trees, so forwards detect
the layout by key):

  enc_rn   {w_ih_p (4,Vp,3H), b_ih (4,3H), w_hh (4,H,3H), b_hh (4,3H)}
           directions [r.fwd, r.bwd, n.fwd, n.bwd]; Vp = ceil128(in_dim)
  enc_1    same, 2 directions, from `gru`   (SingleVAE / SingleGMVAE)
  enc_e    same, 2 directions, from `gru_e` (CVAE / FaderNets)
  sub_rn   {w_ih (2,Dm+Z,3H), b_ih, w_hh, b_hh}; row layout
           [track padded to Dm=max(rhythm,note dims), z]
  grucell_g {w_tok_p (Vp,3H), w_z (Z,3H), b_ih, w_hh, b_hh} — the decoder
           cell's w_ih pre-split at the vocab boundary and pre-padded,
           exactly what ops/pallas_gru.decoder_teacher_fused* build per
           step otherwise.

All padding regions receive identically-zero gradients (pad vocab rows are
never one-hot-selected; pad input columns are zero), so Adam keeps them at
their stored value and `merge_canonical` after any number of fast steps
equals the canonical computation.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# reference layers constructed for state-dict parity but excluded from every
# forward (reference model_v2.py:28,36-37,su; SURVEY.md §2.3)
FROZEN_KEYS = ("gru_c", "gru_d_c", "linear_init_c", "linear_out_c",
               "c_r", "c_n")


def _ceil128(n: int) -> int:
    return ((n + 127) // 128) * 128


def _pack_dirs(grus) -> Dict:
    """Stack bi-GRU direction dicts [g0.fwd, g0.bwd, g1.fwd, ...] into one
    padded group."""
    dirs = []
    for g in grus:
        dirs += [g["fwd"], g["bwd"]]
    w_ih = jnp.stack([d["w_ih"] for d in dirs])          # (L, I, 3H)
    I = w_ih.shape[1]
    w_ih_p = jnp.pad(w_ih, ((0, 0), (0, _ceil128(I) - I), (0, 0)))
    return {
        "w_ih_p": w_ih_p,
        "b_ih": jnp.stack([d["b_ih"] for d in dirs]),
        "w_hh": jnp.stack([d["w_hh"] for d in dirs]),
        "b_hh": jnp.stack([d["b_hh"] for d in dirs]),
    }


def _unpack_dirs(group: Dict, in_dims: int, n_streams: int):
    """Inverse of `_pack_dirs`; yields per-stream {fwd, bwd} dicts."""
    out = []
    for s in range(n_streams):
        stream = {}
        for j, dname in enumerate(("fwd", "bwd")):
            li = 2 * s + j
            stream[dname] = {
                "w_ih": group["w_ih_p"][li, :in_dims],
                "b_ih": group["b_ih"][li],
                "w_hh": group["w_hh"][li],
                "b_hh": group["b_hh"][li],
            }
        out.append(stream)
    return out


def _pack_subs(d_r: Dict, d_n: Dict, z_dims: int) -> Dict:
    """Stack the rhythm/note sub-decoder GRUs into one group with a shared
    input width. Input row layout becomes [track (padded to Dm), z] — the
    canonical layout is [track, z] with per-stream track widths."""
    dr = d_r["w_ih"].shape[0] - z_dims
    dn = d_n["w_ih"].shape[0] - z_dims
    dm = max(dr, dn)

    def scatter(w, d):
        return jnp.concatenate(
            [w[:d], jnp.zeros((dm - d,) + w.shape[1:], w.dtype), w[d:]])

    return {
        "w_ih": jnp.stack([scatter(d_r["w_ih"], dr),
                           scatter(d_n["w_ih"], dn)]),   # (2, Dm+Z, 3H)
        "b_ih": jnp.stack([d_r["b_ih"], d_n["b_ih"]]),
        "w_hh": jnp.stack([d_r["w_hh"], d_n["w_hh"]]),
        "b_hh": jnp.stack([d_r["b_hh"], d_n["b_hh"]]),
    }


def _unpack_subs(group: Dict, dr: int, dn: int, z_dims: int):
    dm = group["w_ih"].shape[1] - z_dims

    def gather(w, d):
        return jnp.concatenate([w[:d], w[dm:]])

    mk = lambda i, d: {
        "w_ih": gather(group["w_ih"][i], d),
        "b_ih": group["b_ih"][i],
        "w_hh": group["w_hh"][i],
        "b_hh": group["b_hh"][i],
    }
    return mk(0, dr), mk(1, dn)


def split_fast(params: Dict) -> Tuple[Dict, Dict]:
    """Canonical params -> (fast params, frozen parity-only leaves)."""
    p = dict(params)
    frozen = {k: p.pop(k) for k in FROZEN_KEYS if k in p}
    if "gru_r" in p and "gru_n" in p:
        p["enc_rn"] = _pack_dirs([p.pop("gru_r"), p.pop("gru_n")])
    elif "gru" in p and isinstance(p["gru"], dict) and "fwd" in p["gru"]:
        p["enc_1"] = _pack_dirs([p.pop("gru")])
    elif "gru_e" in p:
        p["enc_e"] = _pack_dirs([p.pop("gru_e")])
    if "gru_d_r" in p and "gru_d_n" in p:
        z_dims = p["mu_r"]["w"].shape[1]
        p["sub_rn"] = _pack_subs(p.pop("gru_d_r"), p.pop("gru_d_n"), z_dims)
    if "grucell_g" in p and "w_ih" in p["grucell_g"]:
        g = dict(p["grucell_g"])
        w_ih = g.pop("w_ih")
        V = p["linear_out_g"]["w"].shape[1]
        Vp = _ceil128(V)
        g["w_tok_p"] = jnp.pad(w_ih[:V], ((0, Vp - V), (0, 0)))
        g["w_z"] = w_ih[V:]
        p["grucell_g"] = g
    return p, frozen


def merge_canonical(fast: Dict, frozen: Dict, template: Dict) -> Dict:
    """Inverse of `split_fast`. `template` is any pytree with the canonical
    structure/shapes (e.g. the pre-split params) — only `.shape` is read,
    so passing traced/donated values is fine."""
    p = dict(fast)
    p.update(frozen)
    if "enc_rn" in p:
        group = p.pop("enc_rn")
        in_dims = template["gru_r"]["fwd"]["w_ih"].shape[0]
        p["gru_r"], p["gru_n"] = _unpack_dirs(group, in_dims, 2)
    elif "enc_1" in p:
        (p["gru"],) = _unpack_dirs(
            p.pop("enc_1"), template["gru"]["fwd"]["w_ih"].shape[0], 1)
    elif "enc_e" in p:
        (p["gru_e"],) = _unpack_dirs(
            p.pop("enc_e"), template["gru_e"]["fwd"]["w_ih"].shape[0], 1)
    if "sub_rn" in p:
        z_dims = template["mu_r"]["w"].shape[1]
        dr = template["gru_d_r"]["w_ih"].shape[0] - z_dims
        dn = template["gru_d_n"]["w_ih"].shape[0] - z_dims
        p["gru_d_r"], p["gru_d_n"] = _unpack_subs(p.pop("sub_rn"), dr, dn,
                                                  z_dims)
    if "grucell_g" in p and "w_tok_p" in p["grucell_g"]:
        g = dict(p["grucell_g"])
        V = template["linear_out_g"]["w"].shape[1]
        g["w_ih"] = jnp.concatenate([g.pop("w_tok_p")[:V], g.pop("w_z")])
        p["grucell_g"] = g
    return p


# ---------------------------------------------------------------------------
# optimizer-state conversion: Adam's mu/nu mirror the param structure
# ---------------------------------------------------------------------------


def _is_params_dict(x) -> bool:
    return isinstance(x, dict) and "grucell_g" in x


def _map_params_subtrees(tree, f):
    """Apply `f` to every params-structured sub-dict inside an optax state
    (Adam's mu/nu), leaving other leaves (step counts, empty states)
    untouched."""
    def g(x):
        return f(x) if _is_params_dict(x) else x

    return jax.tree_util.tree_map(g, tree, is_leaf=_is_params_dict)


def opt_state_split_fast(opt_state):
    """(fast opt_state, frozen mu/nu leaves keyed by position)."""
    fast = _map_params_subtrees(opt_state, lambda p: split_fast(p)[0])
    frozen = _map_params_subtrees(opt_state, lambda p: split_fast(p)[1])
    return fast, frozen


def opt_state_merge_canonical(fast_opt, frozen_opt, template: Dict):
    """Two-tree inverse of `opt_state_split_fast`."""
    def g(a, b):
        return merge_canonical(a, b, template) if _is_params_dict(a) else a

    return jax.tree_util.tree_map(g, fast_opt, frozen_opt,
                                  is_leaf=_is_params_dict)
