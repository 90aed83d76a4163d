"""Pallas fused stacked-GRU scan (forward + custom VJP) for training.

Under XLA, each `lax.scan` step of the GRU recurrence is a small batched
matmul plus gate math launched with per-step overhead — measured ~23 TFLOPs
achieved on the fused encoder scan (overhead-bound). This kernel runs the
WHOLE T-loop on-core with a grid of (L, T): the per-layer `w_hh` tile stays
resident in VMEM across its layer's steps (Mosaic does not re-fetch a block
whose index is unchanged), the hoisted input projections stream in through
the automatic grid pipeline, and the hidden carry lives in an f32 VMEM
scratch.

The backward pass is a second kernel walking t in reverse (via the output
index map), recomputing the gates from `pre` and `h_prev` (cheaper than
persisting (L,T,B,3H) gate tensors to HBM) and accumulating `dW_hh`/`db_hh`
directly into its VMEM-resident output blocks.

Semantics are EXACTLY `ops.gru.stacked_gru_scan` (same gate math/order);
equivalence of values and gradients is pinned by tests/test_pallas_gru.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# Interpreter-mode escape hatch so CPU tests (and the driver's multichip
# dryrun) can exercise the kernel + its shard_map composition without TPU
# hardware. Consulted at trace time by every pallas_call below.
INTERPRET = False


def _gates_f32(pre_x, pre_h, h):
    H = h.shape[-1]
    r = jax.nn.sigmoid(pre_x[:, :H] + pre_h[:, :H])
    z = jax.nn.sigmoid(pre_x[:, H:2 * H] + pre_h[:, H:2 * H])
    n = jnp.tanh(pre_x[:, 2 * H:] + r * pre_h[:, 2 * H:])
    return r, z, n, (1.0 - z) * n + z * h


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _pick_l_block(L: int, B: int, H: int, G: int, itemsize: int) -> int:
    """Largest L-block whose weights + double-buffered pre/out blocks +
    carries fit a conservative VMEM budget. Bigger blocks amortize the
    per-grid-step overhead over more MXU work (the recurrence is
    overhead-bound: ~23 TFLOPs achieved at l_block=1)."""
    budget = 13 * 1024 * 1024
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        need = (lb * H * G * itemsize            # weights (resident)
                + 2 * lb * B * G * itemsize      # pre blocks (double buffer)
                + 2 * lb * B * H * itemsize      # out blocks
                + 2 * lb * B * H * 4)            # f32 carry + headroom
        if need <= budget:
            return lb
    return 1


def _fwd_kernel(precision, lb, pre_ref, w_ref, b_ref, h0_ref, out_ref, h_c):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_c[:] = h0_ref[:].astype(F32)

    for j in range(lb):                      # unrolled over the L-block
        h = h_c[j]
        pre_x = pre_ref[j, 0].astype(F32)
        pre_h = jax.lax.dot_general(
            h, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
            precision=precision) + b_ref[j].astype(F32)
        _, _, _, h_new = _gates_f32(pre_x, pre_h, h)
        h_c[j] = h_new
        out_ref[j, 0] = h_new.astype(out_ref.dtype)


def _fwd_pallas(pre, w_hh, b_hh, h0, precision=None):
    L, T, B, G = pre.shape
    H = h0.shape[-1]
    lb = _pick_l_block(L, B, H, G, pre.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, precision, lb),
        grid=(L // lb, T),
        in_specs=[
            pl.BlockSpec((lb, 1, B, G), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((lb, 1, B, H), lambda l, t: (l, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, T, B, H), pre.dtype),
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(pre, w_hh, b_hh[:, None, :], h0)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(precision, lb, pre_ref, hprev_ref, g_ref, w_ref, b_ref,
                dpre_ref, dw_ref, db_ref, dh0_ref, dh_c):
    t_rev = pl.program_id(1)
    T = pl.num_programs(1)

    @pl.when(t_rev == 0)
    def _():
        dh_c[:] = jnp.zeros_like(dh_c)
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    for j in range(lb):                      # unrolled over the L-block
        h_prev = hprev_ref[j, 0].astype(F32)
        pre_x = pre_ref[j, 0].astype(F32)
        w = w_ref[j]
        pre_h = jax.lax.dot_general(
            h_prev, w, (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
            precision=precision) + b_ref[j].astype(F32)
        r, z, n, _ = _gates_f32(pre_x, pre_h, h_prev)

        H = h_prev.shape[-1]
        hn_h = pre_h[:, 2 * H:]              # hidden-side n preactivation

        dh_total = g_ref[j, 0].astype(F32) + dh_c[j]
        dn = dh_total * (1.0 - z)
        dz = dh_total * (h_prev - n)
        dan = dn * (1.0 - n * n)
        dr = dan * hn_h
        dhn_h = dan * r
        dar = dr * r * (1.0 - r)
        daz = dz * z * (1.0 - z)

        dpre_x = jnp.concatenate([dar, daz, dan], axis=-1)   # (B, 3H)
        dpre_h = jnp.concatenate([dar, daz, dhn_h], axis=-1)

        # dh_prev = z * dh_total + dpre_h @ w^T
        dh_prev = dh_total * z + jax.lax.dot_general(
            dpre_h, w, (((1,), (1,)), ((), ())), preferred_element_type=F32,
            precision=precision)
        dh_c[j] = dh_prev

        dpre_ref[j, 0] = dpre_x.astype(dpre_ref.dtype)
        # accumulate weight/bias grads in the VMEM-resident output blocks
        dw_ref[j] += jax.lax.dot_general(
            h_prev, dpre_h, (((0,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision)
        db_ref[j] += jnp.sum(dpre_h, axis=0, keepdims=True)

        @pl.when(t_rev == T - 1)
        def _():
            dh0_ref[j] = dh_prev.astype(dh0_ref.dtype)


def _bwd_pallas(pre, h_prev_seq, g_seq, w_hh, b_hh, precision=None):
    L, T, B, G = pre.shape
    H = h_prev_seq.shape[-1]
    rev = lambda l, t: (l, T - 1 - t, 0, 0)
    # backward holds ~2x the forward's live blocks (g + hprev + dpre);
    # halve the block budget by pretending doubled batch
    lb = _pick_l_block(L, 2 * B, H, G, pre.dtype.itemsize)
    dpre, dw, db, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, precision, lb),
        grid=(L // lb, T),
        in_specs=[
            pl.BlockSpec((lb, 1, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lb, 1, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, T, B, G), pre.dtype),
            jax.ShapeDtypeStruct((L, H, G), F32),
            jax.ShapeDtypeStruct((L, 1, G), F32),
            jax.ShapeDtypeStruct((L, B, H), F32),
        ],
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(pre, h_prev_seq, g_seq, w_hh, b_hh[:, None, :])
    return dpre, dw, db[:, 0, :], dh0


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def stacked_gru_pallas(pre: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                       h0: jax.Array, precision=None) -> jax.Array:
    """Fused stacked-GRU forward: pre (L,T,B,3H) -> h_seq (L,T,B,H).
    Same math as `ops.gru.stacked_gru_scan`. `precision` controls the MXU
    input precision (None = backend default, matching XLA's training
    matmuls; 'highest' = full f32 for parity checks)."""
    return _fwd_pallas(pre, w_hh, b_hh, h0, precision)


def _vjp_fwd(pre, w_hh, b_hh, h0, precision=None):
    h_seq = _fwd_pallas(pre, w_hh, b_hh, h0, precision)
    return h_seq, (pre, w_hh, b_hh, h0, h_seq)


def _vjp_bwd(precision, res, g_seq):
    pre, w_hh, b_hh, h0, h_seq = res
    h_prev_seq = jnp.concatenate(
        [h0[:, None].astype(h_seq.dtype), h_seq[:, :-1]], axis=1)
    dpre, dw, db, dh0 = _bwd_pallas(pre, h_prev_seq,
                                    g_seq.astype(pre.dtype), w_hh, b_hh,
                                    precision)
    return (dpre, dw.astype(w_hh.dtype), db.astype(b_hh.dtype),
            dh0.astype(h0.dtype))


stacked_gru_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def stacked_gru_scan_pallas(pre, w_hh, b_hh, h0,
                            precision=None) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for `ops.gru.stacked_gru_scan` with (L,T,B,3H)-major `pre`."""
    h_seq = stacked_gru_pallas(pre, w_hh, b_hh, h0, precision)
    return h_seq, h_seq[:, -1]


# ---------------------------------------------------------------------------
# data-parallel composition: shard_map over the mesh's `data` axis
# ---------------------------------------------------------------------------
# A pallas_call cannot be GSPMD-partitioned, so under a mesh the kernel is
# wrapped in a shard_map: each device runs the fused kernel on its batch
# shard with replicated weights. Autodiff does NOT go through the shard_map —
# this is a second custom_vjp whose fwd/bwd each shard_map the raw kernels,
# with the weight/bias cotangents explicitly psum'd over `data` (the manual
# equivalent of the gradient all-reduce GSPMD inserts on the XLA-scan path).


def _dp_specs(axis):
    from jax.sharding import PartitionSpec as P
    return (P(None, None, axis, None),   # (L, T, B, G/H) batch-sharded
            P(None, axis, None),         # (L, B, H) batch-sharded
            P())                         # replicated weights/biases


def _dp_fwd_impl(pre, w_hh, b_hh, h0, mesh, axis, precision):
    b4, b3, rep = _dp_specs(axis)
    f = jax.shard_map(
        functools.partial(_fwd_pallas, precision=precision),
        mesh=mesh, in_specs=(b4, rep, rep, b3), out_specs=b4,
        check_vma=False)
    return f(pre, w_hh, b_hh, h0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def stacked_gru_pallas_dp(pre: jax.Array, w_hh: jax.Array, b_hh: jax.Array,
                          h0: jax.Array, mesh, axis: str = "data",
                          precision=None) -> jax.Array:
    """`stacked_gru_pallas` over a pure-dp mesh (model axis size 1).
    pre (L,T,B,3H) / h0 (L,B,H) are batch-sharded over `axis`; weights are
    replicated. Gradients match the single-device kernel's."""
    return _dp_fwd_impl(pre, w_hh, b_hh, h0, mesh, axis, precision)


def _dp_vjp_fwd(pre, w_hh, b_hh, h0, mesh, axis, precision):
    h_seq = _dp_fwd_impl(pre, w_hh, b_hh, h0, mesh, axis, precision)
    return h_seq, (pre, w_hh, b_hh, h0, h_seq)


def _dp_vjp_bwd(mesh, axis, precision, res, g_seq):
    pre, w_hh, b_hh, h0, h_seq = res
    h_prev_seq = jnp.concatenate(
        [h0[:, None].astype(h_seq.dtype), h_seq[:, :-1]], axis=1)
    b4, b3, rep = _dp_specs(axis)

    def body(pre_, hprev_, g_, w_, b_):
        dpre, dw, db, dh0 = _bwd_pallas(pre_, hprev_, g_, w_, b_, precision)
        # weight/bias grads are partial sums over the local batch shard
        return (dpre, jax.lax.psum(dw, axis), jax.lax.psum(db, axis), dh0)

    f = jax.shard_map(body, mesh=mesh,
                  in_specs=(b4, b4, b4, rep, rep),
                  out_specs=(b4, rep, rep, b3),
                  check_vma=False)
    dpre, dw, db, dh0 = f(pre, h_prev_seq, g_seq.astype(pre.dtype),
                          w_hh, b_hh)
    return (dpre, dw.astype(w_hh.dtype), db.astype(b_hh.dtype),
            dh0.astype(h0.dtype))


stacked_gru_pallas_dp.defvjp(_dp_vjp_fwd, _dp_vjp_bwd)
