"""GRU primitives, designed TPU-first.

The reference drives cuDNN `nn.GRU` for encoders/sub-decoders and a per-step
eager `nn.GRUCell` Python loop for the global decoder (reference
model_v2.py:81-143). Here every recurrence is a `lax.scan`, and — the key
TPU optimization — the input-to-hidden projection of an entire sequence is
hoisted OUT of the scan into one large `(B*T, I) @ (I, 3H)` matmul that tiles
onto the MXU. The scan body then only performs the inherently sequential
hidden-to-hidden `(B, H) @ (H, 3H)` matmul plus VPU gate math, which XLA fuses.

Gate order is PyTorch's (r, z, n) so released `.pt` checkpoints convert
weight-for-weight (transpose only). Weights are stored input-major
(`(I, 3H)` / `(H, 3H)`) so the forward pass is `x @ w` with no transposes.

Cell math (identical to `torch.nn.GRUCell`):
    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh  (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

GRU_GATES = 3


# --------------------------------------------------------------------------
# Parameter construction
# --------------------------------------------------------------------------

def _torch_uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def gru_init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    """Parameters of a single-direction GRU layer / cell.

    Initialization matches `torch.nn.GRU`: every tensor ~ U(-k, k),
    k = 1/sqrt(hidden).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "w_ih": _torch_uniform(k1, (in_dim, GRU_GATES * hidden), bound, dtype),
        "w_hh": _torch_uniform(k2, (hidden, GRU_GATES * hidden), bound, dtype),
        "b_ih": _torch_uniform(k3, (GRU_GATES * hidden,), bound, dtype),
        "b_hh": _torch_uniform(k4, (GRU_GATES * hidden,), bound, dtype),
    }


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Parameters of a dense layer; init matches `torch.nn.Linear` defaults
    (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the
    weight, U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the bias)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": _torch_uniform(kw, (in_dim, out_dim), bound, dtype),
        "b": _torch_uniform(kb, (out_dim,), bound, dtype),
    }


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


# Back-compat alias used in a few call sites.
linear = linear_apply


# --------------------------------------------------------------------------
# Cell and scan
# --------------------------------------------------------------------------

def _gates(pre_x: jax.Array, pre_h: jax.Array, h: jax.Array, hidden: int) -> jax.Array:
    """VPU gate math given precomputed input and hidden projections.

    pre_x: (..., 3H) = x @ w_ih + b_ih
    pre_h: (..., 3H) = h @ w_hh + b_hh
    """
    xr, xz, xn = jnp.split(pre_x, 3, axis=-1)
    hr, hz, hn = jnp.split(pre_h, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_cell(p: dict, x: jax.Array, h: jax.Array) -> jax.Array:
    """One GRU step: x (B, I), h (B, H) -> h' (B, H)."""
    hidden = h.shape[-1]
    pre_x = x @ p["w_ih"] + p["b_ih"]
    pre_h = h @ p["w_hh"] + p["b_hh"]
    return _gates(pre_x, pre_h, h, hidden)


def gru_cell_from_pre(p: dict, pre_x: jax.Array, h: jax.Array) -> jax.Array:
    """GRU step when the input projection was already computed (hoisted)."""
    hidden = h.shape[-1]
    pre_h = h @ p["w_hh"] + p["b_hh"]
    return _gates(pre_x, pre_h, h, hidden)


def gru_scan(
    p: dict,
    x: jax.Array,
    h0: Optional[jax.Array] = None,
    reverse: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run a GRU over a full sequence.

    x: (B, T, I) batch-major. Returns (outputs (B, T, H), final hidden (B, H)).

    The input projection for all T steps is computed as a single MXU matmul
    before the scan; the scan body is the (B,H)@(H,3H) recurrence only.
    """
    B, T, _ = x.shape
    hidden = p["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, hidden), dtype=x.dtype)

    pre_x = x @ p["w_ih"] + p["b_ih"]          # (B, T, 3H) — one big matmul
    pre_x = jnp.swapaxes(pre_x, 0, 1)          # (T, B, 3H) time-major for scan

    def body(h, pre_t):
        h_new = gru_cell_from_pre(p, pre_t, h)
        return h_new, h_new

    h_final, outs = jax.lax.scan(body, h0, pre_x, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), h_final


def stacked_gru_scan(pre: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                     h0: jax.Array,
                     use_pallas: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Run L independent GRUs of equal length in ONE scan.

    TPU rationale: XLA executes separate `lax.scan`s sequentially, so L
    independent recurrences cost L*T sequential small matmuls. Stacking them
    makes each scan step a single batched `(L,B,H)@(L,H,3H)` contraction —
    T sequential steps total, each with L x the MXU work.

    pre:  (L, T, B, 3H) hoisted input projections (+ b_ih), already
          time-reversed for any backward direction.
    w_hh: (L, H, 3H); b_hh: (L, 3H); h0: (L, B, H).
    Returns (outputs (L, T, B, H), final hidden (L, B, H)).
    """
    L, T, B, G = pre.shape
    H = h0.shape[-1]

    if use_pallas:
        from music_fader_nets_tpu.ops import pallas_gru
        from music_fader_nets_tpu.parallel import mesh as mesh_lib
        kind, mesh = pallas_gru.kernel_dispatch(B)
        if kind == "single":
            # fused whole-sequence kernel with custom VJP
            # (ops/pallas_gru.py): ~2x f32 over this scan on fwd+grad
            return pallas_gru.stacked_gru_scan_pallas(pre, w_hh, b_hh, h0)
        if kind == "dp":
            # pure-dp mesh: shard_map the kernel over `data`; weight
            # grads psum'd inside (ops/pallas_gru.py dp wrapper)
            h_seq = pallas_gru.stacked_gru_pallas_dp(
                pre, w_hh, b_hh, h0, mesh, mesh_lib.DATA_AXIS)
            return h_seq, h_seq[:, -1]
        # tp mesh (or indivisible batch, or CPU): fall through to the XLA
        # scan, which GSPMD partitions over the gate dimension

    def body(h, pre_t):
        pre_h = jnp.einsum("lbh,lhg->lbg", h, w_hh) + b_hh[:, None, :]
        h_new = _gates(pre_t, pre_h, h, H)
        return h_new, h_new

    h_final, outs = jax.lax.scan(body, h0, jnp.swapaxes(pre, 0, 1))
    return jnp.swapaxes(outs, 0, 1), h_final


def _embed_kernel_dispatch(B: int):
    """Which embedded-token pallas path applies here ('single'/'dp'/None).
    Thin alias over the one shared rule (pallas_gru.kernel_dispatch);
    benchmarks monkeypatch THIS name to force the generic path."""
    from music_fader_nets_tpu.ops import pallas_gru
    return pallas_gru.kernel_dispatch(B)


def multi_gru_final_states_packed(w_ih_p: jax.Array, b_ih: jax.Array,
                                  w_hh: jax.Array, b_hh: jax.Array,
                                  x: jax.Array, reverse: list,
                                  use_pallas: bool = False,
                                  tokens: Optional[jax.Array] = None
                                  ) -> jax.Array:
    """Final hidden states of L same-shaped GRUs over the SAME input
    sequence, fused into one scan, taking PRE-STACKED weights (the fast
    param layout, models/fast.py — avoids re-running the stack/pad fusions
    every step).

    w_ih_p: (L, Ip, 3H) with the input dim padded to the kernel's
    lane-aligned width (Ip = ceil128(I)); pad rows must be zero.
    b_ih/b_hh: (L, 3H); w_hh: (L, H, 3H).
    reverse: list of L bools; True = consume x right-to-left.
    tokens: optional (B, T) int32 ids when `x` is exactly one_hot(tokens) —
    enables the embedded-token pallas kernel (ops/pallas_gru.py), which
    folds the input projection into the recurrence on-core and never
    materializes the (L,T,B,3H) pre/dpre tensors in HBM.
    Returns (L, B, H) final states (for reversed directions this is the
    state after consuming the whole sequence, i.e. the torch `h_n` entry).
    """
    B, T, V = x.shape
    L, H = w_hh.shape[0], w_hh.shape[1]

    if use_pallas and tokens is not None:
        kind, mesh = _embed_kernel_dispatch(B)
        if kind is not None:
            from music_fader_nets_tpu.ops import pallas_gru
            from music_fader_nets_tpu.parallel import mesh as mesh_lib
            tok_t = jnp.swapaxes(tokens.astype(jnp.int32), 0, 1)   # (T, B)
            tok_lt = jnp.stack([jnp.flip(tok_t, axis=0) if r else tok_t
                                for r in reverse])                 # (L, T, B)
            h0 = jnp.zeros((L, B, H), x.dtype)
            if kind == "single":
                return pallas_gru.stacked_gru_embed_finals(
                    tok_lt, w_ih_p, b_ih, w_hh, b_hh, h0)
            return pallas_gru.stacked_gru_embed_finals_dp(
                tok_lt, w_ih_p, b_ih, w_hh, b_hh, h0,
                mesh, mesh_lib.DATA_AXIS)

    # One big MXU matmul for every direction's full-sequence input proj.
    # Reversed directions consume the time-flipped INPUT (small) rather than
    # flipping the (L,T,B,3H) projection afterwards — avoids materializing a
    # second copy of the large `pre` tensor in HBM. (The [:, :V] slice of a
    # freshly-padded w_ih_p folds away under XLA's slice-of-pad rule, so the
    # canonical wrapper below pays nothing for the round trip.)
    w_ih = w_ih_p[:, :V]
    x_dir = jnp.stack([jnp.flip(x, axis=1) if r else x for r in reverse])
    pre = jnp.einsum("lbti,lig->ltbg", x_dir, w_ih) + b_ih[:, None, None, :]
    h0 = jnp.zeros((L, B, H), x.dtype)
    _, h_final = stacked_gru_scan(pre, w_hh, b_hh, h0, use_pallas=use_pallas)
    return h_final


def multi_gru_final_states(params: list, x: jax.Array,
                           reverse: list,
                           use_pallas: bool = False,
                           tokens: Optional[jax.Array] = None) -> jax.Array:
    """`multi_gru_final_states_packed` over a list of per-direction GRU
    param dicts (canonical layout): stacks/pads them in-graph, then
    delegates. params: list of L GRU param dicts (same in_dim/hidden)."""
    V = params[0]["w_ih"].shape[0]
    Vp = ((V + 127) // 128) * 128
    w_ih = jnp.stack([p["w_ih"] for p in params])       # (L, I, 3H)
    w_ih_p = jnp.pad(w_ih, ((0, 0), (0, Vp - V), (0, 0)))
    b_ih = jnp.stack([p["b_ih"] for p in params])
    w_hh = jnp.stack([p["w_hh"] for p in params])
    b_hh = jnp.stack([p["b_hh"] for p in params])
    return multi_gru_final_states_packed(w_ih_p, b_ih, w_hh, b_hh, x,
                                         reverse, use_pallas=use_pallas,
                                         tokens=tokens)


def bigru_final_state(p_fwd: dict, p_bwd: dict, x: jax.Array) -> jax.Array:
    """Bidirectional GRU, returning concat of final states (B, 2H).

    Matches `nn.GRU(bidirectional=True)(x)[-1]` followed by the reference's
    transpose/reshape (reference model_v2.py:83-85): the forward direction's
    state after the last step, then the backward direction's state after
    consuming the sequence in reverse (i.e. its state "at t=0").
    """
    _, h_fwd = gru_scan(p_fwd, x)
    _, h_bwd = gru_scan(p_bwd, x, reverse=True)
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)


def bigru_init(key, in_dim: int, hidden: int, dtype=jnp.float32) -> dict:
    kf, kb = jax.random.split(key)
    return {
        "fwd": gru_init(kf, in_dim, hidden, dtype),
        "bwd": gru_init(kb, in_dim, hidden, dtype),
    }


def bigru_apply(p: dict, x: jax.Array) -> jax.Array:
    return bigru_final_state(p["fwd"], p["bwd"], x)
