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
index map), recomputing the gates from `pre` and `h_prev` and accumulating
`dW_hh`/`db_hh` directly into its VMEM-resident output blocks. NB the
embed-encoder and fused-decoder kernels below instead STASH the gates
`[r, z, n, hn_h]` in the forward — there the backward skips big embedding/
projection matmuls, a measured win. For THIS generic kernel the stash was
measured a net loss at its production geometry (sub-decoders, T=16: the
4H/step stash write exceeds the one (B,H)@(H,3H) recompute it saves —
vanilla train step 5.43 -> 5.85 ms), so it recomputes.

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
# NB: flipping this also makes `kernel_dispatch` treat NON-TPU backends as
# kernel-applicable, rerouting production numerics through interpreted
# kernels — it is a test-only knob, never set it in library code.
INTERPRET = False


# which path kernel_dispatch routed TRAINING recurrences to since the last
# reset (assign None to reset): "kernel-single", "kernel-dp", or a scan
# reason ("scan-cpu", "scan-tp-mesh", "scan-indivisible-batch").
# kernel_dispatch is only consulted when kernels were REQUESTED
# (cfg.use_pallas_gru / use_pallas=True call sites), so a "scan-*" value
# here always means a requested kernel silently degraded to the GSPMD scan
# — bench.py surfaces it as `train_path` in its JSON line, mirroring
# pallas_decode.LAST_DECODE_PATH (round-4 VERDICT "what's weak" #4).
# Worst-path-wins: one trace can consult several times with different
# batch sizes (e.g. GLSR's 4B-row regularizer decode divides a dp mesh
# that its B-row encoder consult does not), and a later kernel hit must
# not mask an earlier scan fallback.
LAST_TRAIN_PATH = None

_warned_train_fallback = False


def _record_train_path(path: str) -> None:
    global LAST_TRAIN_PATH
    if (LAST_TRAIN_PATH is not None and LAST_TRAIN_PATH.startswith("scan")
            and path.startswith("kernel")):
        return
    LAST_TRAIN_PATH = path


def kernel_dispatch(B: int):
    """The ONE applicability rule for every pallas training kernel here.

    Returns ('single', None) on a bare TPU (or interpret mode),
    ('dp', mesh) under a pure-dp trace mesh with a divisible batch (the
    shard_map wrappers apply), and (None, None) otherwise — tp meshes and
    CPU fall back to the GSPMD-partitionable XLA scans.

    Every call records `LAST_TRAIN_PATH`; a fallback ON TPU (tp mesh /
    indivisible batch — the user asked for kernels on hardware that has
    them) additionally warns once per process. CPU fallbacks stay quiet:
    that is the documented test/dev configuration, not a degradation."""
    global _warned_train_fallback
    if jax.default_backend() != "tpu" and not INTERPRET:
        _record_train_path("scan-cpu")
        return None, None
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.current_trace_mesh()
    if mesh is None or mesh.size == 1:
        _record_train_path("kernel-single")
        return "single", None
    n_data = mesh.shape.get(mesh_lib.DATA_AXIS, mesh.size)
    if mesh.shape.get(mesh_lib.MODEL_AXIS, 1) == 1 and B % n_data == 0:
        _record_train_path("kernel-dp")
        return "dp", mesh
    if mesh.shape.get(mesh_lib.MODEL_AXIS, 1) != 1:
        reason = "scan-tp-mesh"
    else:
        reason = "scan-indivisible-batch"
    _record_train_path(reason)
    if not _warned_train_fallback:
        import warnings
        warnings.warn(
            f"pallas GRU training kernels requested but inapplicable here "
            f"({reason}: mesh "
            f"{dict(mesh.shape)}, per-process batch {B}); training runs "
            f"the GSPMD-partitioned XLA scan instead",
            RuntimeWarning, stacklevel=3)
        _warned_train_fallback = True
    return None, None


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
    """Largest forward L-block whose live VMEM set fits a conservative
    budget (v5e VMEM is 128MB; pallas_call asks for 120MB — leave headroom
    for Mosaic's own buffers). Bigger blocks amortize per-grid-step
    overhead over more MXU work; a chip sweep
    (benchmarks/kernel_lb_sweep.py) shows the largest fitting block is
    best, by a few percent. Backward block sizes are modeled separately by
    `_pick_bwd_blocks` (which also picks the kt time block)."""
    budget = 72 * 1024 * 1024
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        need = lb * (H * G * itemsize            # weights (resident)
                     + 2 * B * G * itemsize      # pre blocks (db)
                     + 2 * B * H * itemsize      # out blocks (db)
                     + 2 * B * H * 4)            # f32 carry + headroom
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


def _pick_t_block(T: int, fits, prefs=(2, 1)) -> int:
    """Time-block size kt (a divisor of T) whose VMEM need passes
    `fits(kt)`, tried in measured preference order. Time-blocking batches
    the dW/db accumulation: ONE rank-(kt*B) matmul + ONE accumulator
    read-modify-write per block instead of kt rank-B matmuls + kt RMWs of
    the f32 accumulators. The chip sweep (benchmarks/kt_sweep.py, v5e,
    B=128 T=100 H=512) shows small kt wins and large kt LOSES (block
    granularity starves the grid pipeline): generic 2>1>4>5>10, embed
    4>1>2>5=10, CE decoder 2>>5>10>4>1 (kt=2 is -16% vs per-step there)."""
    for kt in prefs:
        if kt <= T and T % kt == 0 and fits(kt):
            return kt
    return 1


def _bwd_need(lb, kt, B, H, G, itemsize):
    return lb * (2 * kt * B * G * itemsize        # pre (double buffer)
                 + 2 * 2 * kt * B * H * itemsize  # h_prev + g (db)
                 + 2 * kt * B * G * itemsize      # dpre out (db)
                 + H * G * itemsize               # w (resident)
                 + H * G * 4                      # dw accumulator (f32)
                 + kt * B * G * 4                 # dpre_h stash (f32)
                 + 2 * B * H * 4)                 # dh0 out + dh carry


def _pick_bwd_blocks(L, T, B, H, G, itemsize):
    """Joint (lb, kt) choice for the generic backward: kt as large as
    possible first (accumulator-traffic cut), then the largest fitting
    l-block."""
    budget = 72 * 1024 * 1024
    kt = _pick_t_block(T, lambda k: _bwd_need(1, k, B, H, G, itemsize)
                       <= budget)
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        if _bwd_need(lb, kt, B, H, G, itemsize) <= budget:
            return lb, kt
    return 1, kt


def _bwd_kernel(precision, lb, kt, pre_ref, hprev_ref, g_ref, w_ref, b_ref,
                dpre_ref, dw_ref, db_ref, dh0_ref, dh_c, dph_c):
    tb_rev = pl.program_id(1)
    TB = pl.num_programs(1)

    @pl.when(tb_rev == 0)
    def _():
        dh_c[:] = jnp.zeros_like(dh_c)
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    for j in range(lb):                      # unrolled over the L-block
        w = w_ref[j]
        B, H = dh_c.shape[1], dh_c.shape[2]
        G = w.shape[-1]
        # batched recompute over the whole time block: one (kt*B,H)@(H,G)
        h_prev_blk = hprev_ref[j].astype(F32)               # (kt, B, H)
        pre_h_blk = (jax.lax.dot_general(
            h_prev_blk.reshape(kt * B, H), w, (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision)
            + b_ref[j].astype(F32)).reshape(kt, B, G)

        for s in range(kt - 1, -1, -1):      # sequential dh chain, reversed
            h_prev = h_prev_blk[s]
            pre_h = pre_h_blk[s]
            r, z, n, _ = _gates_f32(pre_ref[j, s].astype(F32), pre_h, h_prev)
            dh_total = g_ref[j, s].astype(F32) + dh_c[j]
            dpre_x, dpre_h, dhloc = _gate_bwd(dh_total, r, z, n,
                                              pre_h[:, 2 * H:], h_prev)
            dh_c[j] = dhloc + jax.lax.dot_general(
                dpre_h, w, (((1,), (1,)), ((), ())),
                preferred_element_type=F32, precision=precision)
            dpre_ref[j, s] = dpre_x.astype(dpre_ref.dtype)
            dph_c[j, s] = dpre_h             # stash for the batched dW
            if s == 0:
                @pl.when(tb_rev == TB - 1)
                def _():
                    dh0_ref[j] = dh_c[j].astype(dh0_ref.dtype)

        # ONE accumulator update per block: rank-(kt*B) dW matmul + db sum
        dph = dph_c[j].reshape(kt * B, G)
        dw_ref[j] += jax.lax.dot_general(
            h_prev_blk.reshape(kt * B, H), dph, (((0,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision)
        db_ref[j] += jnp.sum(dph, axis=0, keepdims=True)


def _bwd_pallas(pre, h_prev_seq, g_seq, w_hh, b_hh, precision=None):
    L, T, B, G = pre.shape
    H = h_prev_seq.shape[-1]
    lb, kt = _pick_bwd_blocks(L, T, B, H, G, pre.dtype.itemsize)
    TB = T // kt
    rev = lambda l, t: (l, TB - 1 - t, 0, 0)
    dpre, dw, db, dh0 = pl.pallas_call(
        functools.partial(_bwd_kernel, precision, lb, kt),
        grid=(L // lb, TB),
        in_specs=[
            pl.BlockSpec((lb, kt, B, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lb, kt, B, G), rev, memory_space=pltpu.VMEM),
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
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32),
                        pltpu.VMEM((lb, kt, B, G), F32)],
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
# token-embedded variant: encoder GRUs over one-hot token inputs
# ---------------------------------------------------------------------------
# The encoder consumes ONE-HOT tokens, so its hoisted input projection
# x_oh @ w_ih is really an embedding lookup — and its input carries no
# gradient. This kernel folds the lookup INTO the recurrence (per-step
# iota-compare one-hot @ VMEM-resident w_ih, the pallas_decode.py pattern)
# and the backward accumulates dW_ih/db_ih on-core, so the (L,T,B,3H) `pre`
# and `dpre` tensors (315MB each at bench shapes) never exist in HBM.
# Profiled on-chip: removes ~1.4ms/step of XLA glue (gather-fusion,
# dW_ih matmul, db reduce, h_prev pads) on top of the DMA time saved.


def _pick_l_block_embed(L, B, H, G, Vp, itemsize, stash=False):
    """Forward L-block picker for the embedded-token kernel; the backward
    is sized by `_pick_bwd_blocks_embed`."""
    budget = 72 * 1024 * 1024
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        need = lb * (Vp * G * itemsize           # w_ih (resident)
                     + H * G * itemsize          # w_hh (resident)
                     + 2 * B * H * itemsize      # tok one-hot scratch
                     + 2 * B * H * itemsize      # out blocks (db)
                     + (2 * B * 4 * H * itemsize if stash else 0)
                     + 2 * B * H * 4)            # f32 carry
        if need <= budget:
            return lb
    return 1


def _rows_onehot(tok_2d, kt, B, Vp, dtype=None):
    """(kt, B) int tokens -> (kt*B, Vp) one-hot rows, built as kt stacked
    (B, Vp) iota-compares. NB a direct (kt,1,B)->(kt*B,) reshape of the
    token vector moves lane data into sublanes, which Mosaic cannot
    shape-cast; per-step compares + sublane concat avoid it."""
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    rows = [col == tok_2d[s][:, None] for s in range(kt)]
    oh = rows[0] if kt == 1 else jnp.concatenate(rows, axis=0)
    return oh if dtype is None else oh.astype(dtype)


def _rows_col(x_2d, kt):
    """(kt, B) -> (kt*B, 1) column, same lane-safe construction."""
    cols = [x_2d[s][:, None] for s in range(kt)]
    return cols[0] if kt == 1 else jnp.concatenate(cols, axis=0)


def _embed_pre_x(tok, w_ih, b_ih, Vp, precision):
    """(B,) int32 tokens -> (B, 3H) f32 input projection, on the MXU via an
    iota-compare one-hot (tokens are < V <= Vp, pad rows never selected)."""
    B = tok.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    onehot = (col == tok[:, None]).astype(w_ih.dtype)
    return (jax.lax.dot_general(onehot, w_ih, (((1,), (0,)), ((), ())),
                                preferred_element_type=F32,
                                precision=precision)
            + b_ih.astype(F32)), onehot


def _fwd_embed_kernel(precision, lb, Vp, stash,
                      tok_ref, wih_ref, bih_ref, w_ref, b_ref, h0_ref,
                      *refs):
    out_ref, g4_ref, h_c = refs if stash else (refs[0], None, refs[1])
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_c[:] = h0_ref[:].astype(F32)

    for j in range(lb):
        h = h_c[j]
        H = h.shape[-1]
        pre_x, _ = _embed_pre_x(tok_ref[j, 0, 0], wih_ref[j], bih_ref[j],
                                Vp, precision)
        pre_h = jax.lax.dot_general(
            h, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision
        ) + b_ref[j].astype(F32)
        r, z, n, h_new = _gates_f32(pre_x, pre_h, h)
        h_c[j] = h_new
        out_ref[j, 0] = h_new.astype(out_ref.dtype)
        if stash:
            # gate stash for the backward: [r, z, n, hn_h] (B, 4H) — lets
            # the bwd kernel skip BOTH recompute matmuls (pre_x embed +
            # pre_h), trading ~39% of its FLOPs for streamed HBM reads
            g4_ref[j, 0] = jnp.concatenate(
                [r, z, n, pre_h[:, 2 * H:]], axis=-1).astype(g4_ref.dtype)


def _fwd_embed_pallas(tok_lt, w_ih, b_ih, w_hh, b_hh, h0, precision=None,
                      out_dtype=None, stash_gates=False):
    """tok_lt (L, T, B) int32 (already direction-flipped per layer);
    w_ih (L, Vp, G); returns h_seq (L, T, B, H), plus the (L, T, B, 4H)
    gate stash when `stash_gates` (the training/VJP path)."""
    L, T, B = tok_lt.shape
    H = h0.shape[-1]
    G = w_hh.shape[-1]
    Vp = w_ih.shape[1]
    out_dtype = out_dtype or w_ih.dtype
    lb = _pick_l_block_embed(L, B, H, G, Vp, w_ih.dtype.itemsize,
                             stash=stash_gates)
    seq_spec = pl.BlockSpec((lb, 1, B, H), lambda l, t: (l, t, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [seq_spec]
    out_shape = [jax.ShapeDtypeStruct((L, T, B, H), out_dtype)]
    if stash_gates:
        out_specs.append(pl.BlockSpec((lb, 1, B, 4 * H),
                                      lambda l, t: (l, t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, T, B, 4 * H), out_dtype))
    # tokens as (L, T, 1, B): Mosaic needs the trailing two block dims to
    # be (8,128)-aligned or equal to the array dims — (1, B) qualifies
    outs = pl.pallas_call(
        functools.partial(_fwd_embed_kernel, precision, lb, Vp, stash_gates),
        grid=(L // lb, T),
        in_specs=[
            pl.BlockSpec((lb, 1, 1, B), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, Vp, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if stash_gates else out_specs[0],
        out_shape=out_shape if stash_gates else out_shape[0],
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_lt[:, :, None, :], w_ih, b_ih[:, None, :], w_hh,
      b_hh[:, None, :], h0)
    return outs


def _embed_bwd_need(lb, kt, B, H, G, Vp, itemsize):
    return lb * (H * G * itemsize               # w_hh (resident)
                 + (Vp + H) * G * 4             # dwih + dwhh acc (f32)
                 + 2 * 2 * kt * B * H * itemsize  # hcur + hprevb (db)
                 + 2 * kt * B * 4 * H * itemsize  # g4 gate stash (db)
                 + 2 * B * H * itemsize         # h0 + g (resident)
                 + 2 * kt * B * G * 4           # dpre_x + dpre_h stash
                 + kt * B * Vp * itemsize       # onehot block values
                 + 2 * B * H * 4)               # dh0 out + dh carry


def _pick_bwd_blocks_embed(L, T, B, H, G, Vp, itemsize):
    budget = 72 * 1024 * 1024
    # kt=10 measured fastest post-gate-stash (benchmarks/kt_sweep.py, bench
    # shapes: 3.16ms vs 3.30 at the pre-stash optimum kt=4; kt>=20 regresses
    # again — grid pipeline starvation)
    kt = _pick_t_block(
        T, lambda k: _embed_bwd_need(1, k, B, H, G, Vp, itemsize) <= budget,
        prefs=(10, 4, 1))
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        if _embed_bwd_need(lb, kt, B, H, G, Vp, itemsize) <= budget:
            return lb, kt
    return 1, kt


def _bwd_embed_kernel(precision, lb, kt, Vp, tok_ref, hcur_ref, hprevb_ref,
                      g4_ref, h0_ref, g_ref, w_ref,
                      dwih_ref, dbih_ref, dw_ref, db_ref, dh0_ref,
                      dh_c, dpx_c, dph_c):
    tb_rev = pl.program_id(1)
    TB = pl.num_programs(1)
    first_blk = tb_rev == TB - 1              # block containing t = 0

    @pl.when(tb_rev == 0)
    def _():
        dh_c[:] = jnp.zeros_like(dh_c)
        dwih_ref[:] = jnp.zeros_like(dwih_ref[:])
        dbih_ref[:] = jnp.zeros_like(dbih_ref[:])
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=F32,
                                   precision=precision)

    for j in range(lb):
        w = w_ref[j]
        B = dh_c.shape[1]
        H = dh_c.shape[2]
        G = w.shape[-1]
        # gates come from the forward's stash — no pre_x/pre_h recompute;
        # the onehot is still built for the dW_ih scatter-as-matmul
        onehot = _rows_onehot(tok_ref[j, :, 0, :], kt, B, Vp, w.dtype)
        g4 = g4_ref[j].astype(F32)                         # (kt, B, 4H)
        hcur = hcur_ref[j].astype(F32)                     # h_seq[t0:t0+kt]
        # h_prev for step s>0 is hcur[s-1]; for s==0 it's the previous
        # block's last state (h0 at the very first block)
        h_prev0 = jnp.where(first_blk, h0_ref[j].astype(F32),
                            hprevb_ref[j, kt - 1].astype(F32))
        h_prev_blk = (h_prev0[None] if kt == 1 else jnp.concatenate(
            [h_prev0[None], hcur[: kt - 1]], axis=0))

        for s in range(kt - 1, -1, -1):       # sequential dh chain
            h_prev = h_prev_blk[s]
            r = g4[s, :, :H]
            z = g4[s, :, H:2 * H]
            n = g4[s, :, 2 * H:3 * H]
            hn_h = g4[s, :, 3 * H:]
            # encoder use case: cotangent only on the FINAL state (the last
            # step overall = last s of grid step 0)
            dh_total = dh_c[j]
            if s == kt - 1:
                dh_total = dh_total + jnp.where(
                    tb_rev == 0, g_ref[j].astype(F32),
                    jnp.zeros_like(dh_total))
            dpre_x, dpre_h, dhloc = _gate_bwd(dh_total, r, z, n, hn_h,
                                              h_prev)
            dh_c[j] = dhloc + dot(dpre_h, w, ((1,), (1,)))
            dpx_c[j, s] = dpre_x
            dph_c[j, s] = dpre_h
            if s == 0:
                @pl.when(first_blk)
                def _():
                    dh0_ref[j] = dh_c[j].astype(dh0_ref.dtype)

        # ONE accumulator update per (layer, block): batched dW matmuls
        dpx = dpx_c[j].reshape(kt * B, G)
        dph = dph_c[j].reshape(kt * B, G)
        dwih_ref[j] += dot(onehot, dpx, ((0,), (0,)))
        dbih_ref[j] += jnp.sum(dpx, axis=0, keepdims=True)
        dw_ref[j] += dot(h_prev_blk.reshape(kt * B, H), dph, ((0,), (0,)))
        db_ref[j] += jnp.sum(dph, axis=0, keepdims=True)


def _bwd_embed_pallas(tok_lt, h_seq, g4_seq, h0, g_fin, w_hh, Vp,
                      precision=None):
    """g_fin: cotangent on the FINAL states only (L,B,H) — the encoder use
    case; kept VMEM-resident and applied at the last step. g4_seq is the
    forward's (L,T,B,4H) [r,z,n,hn_h] stash; w_ih/b_ih are not needed (the
    input projection is never recomputed)."""
    L, T, B = tok_lt.shape
    H = h0.shape[-1]
    G = w_hh.shape[-1]
    lb, kt = _pick_bwd_blocks_embed(L, T, B, H, G, Vp,
                                    h_seq.dtype.itemsize)
    TB = T // kt
    rev4 = lambda l, t: (l, TB - 1 - t, 0, 0)
    # previous h_seq block (for the s=0 step's h_prev), clamped at the edge;
    # the kernel substitutes h0 there
    prevb = lambda l, t: (l, jnp.maximum(TB - 2 - t, 0), 0, 0)
    res = lambda l, t: (l, 0, 0)
    g_spec = pl.BlockSpec((lb, B, H), res, memory_space=pltpu.VMEM)
    dwih, dbih, dw, db, dh0 = pl.pallas_call(
        functools.partial(_bwd_embed_kernel, precision, lb, kt, Vp),
        grid=(L // lb, TB),
        in_specs=[
            pl.BlockSpec((lb, kt, 1, B), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), prevb, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, 4 * H), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), res, memory_space=pltpu.VMEM),
            g_spec,
            pl.BlockSpec((lb, H, G), res, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lb, Vp, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), res, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Vp, G), F32),
            jax.ShapeDtypeStruct((L, 1, G), F32),
            jax.ShapeDtypeStruct((L, H, G), F32),
            jax.ShapeDtypeStruct((L, 1, G), F32),
            jax.ShapeDtypeStruct((L, B, H), F32),
        ],
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32),
                        pltpu.VMEM((lb, kt, B, G), F32),
                        pltpu.VMEM((lb, kt, B, G), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_lt[:, :, None, :], h_seq, h_seq, g4_seq, h0, g_fin, w_hh)
    return dwih, dbih[:, 0, :], dw, db[:, 0, :], dh0


def _float0_like(x):
    """Cotangent for an integer-dtype primal (custom_vjp convention)."""
    import numpy as np
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def stacked_gru_embed_finals(tok_lt, w_ih, b_ih, w_hh, b_hh, h0,
                             precision=None):
    """Fused stacked GRU over ONE-HOT token inputs, returning ONLY the
    final states (L,B,H) — the encoder use case. The input projection is an
    on-core embedding matmul of VMEM-resident w_ih (L, Vp, 3H); no
    (L,T,B,3H) pre tensor exists. tok_lt (L, T, B) int32 is already
    time-flipped for reversed directions and carries no gradient. The backward applies the (L,B,H) cotangent at the
    last step directly; no zero-padded (L,T,B,H) cotangent stream is ever
    materialized in HBM."""
    h_seq = _fwd_embed_pallas(tok_lt, w_ih, b_ih, w_hh, b_hh, h0, precision)
    return h_seq[:, -1]


def _embed_fin_vjp_fwd(tok_lt, w_ih, b_ih, w_hh, b_hh, h0, precision):
    h_seq, g4 = _fwd_embed_pallas(tok_lt, w_ih, b_ih, w_hh, b_hh, h0,
                                  precision, stash_gates=True)
    return h_seq[:, -1], (tok_lt, w_ih, b_ih, w_hh, b_hh, h0, h_seq, g4)


def _embed_fin_vjp_bwd(precision, res, g_fin):
    tok_lt, w_ih, b_ih, w_hh, b_hh, h0, h_seq, g4 = res
    dwih, dbih, dw, db, dh0 = _bwd_embed_pallas(
        tok_lt, h_seq, g4, h0, g_fin.astype(h_seq.dtype), w_hh,
        w_ih.shape[1], precision)
    return (_float0_like(tok_lt), dwih.astype(w_ih.dtype),
            dbih.astype(b_ih.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dh0.astype(h0.dtype))


stacked_gru_embed_finals.defvjp(_embed_fin_vjp_fwd, _embed_fin_vjp_bwd)


def _embed_dp_specs(axis):
    from jax.sharding import PartitionSpec as P
    return (P(None, None, axis),         # tok (L, T, B)
            P(None, None, axis, None),   # h_seq / g (L, T, B, H)
            P(None, axis, None),         # h0 (L, B, H)
            P())                         # weights replicated


def _embed_dp_fwd_impl(tok_lt, w_ih, b_ih, w_hh, b_hh, h0, mesh, axis,
                       precision, stash_gates=False):
    tk, b4, b3, rep = _embed_dp_specs(axis)
    f = jax.shard_map(
        functools.partial(_fwd_embed_pallas, precision=precision,
                          stash_gates=stash_gates),
        mesh=mesh, in_specs=(tk, rep, rep, rep, rep, b3),
        out_specs=(b4, b4) if stash_gates else b4,
        check_vma=False)
    return f(tok_lt, w_ih, b_ih, w_hh, b_hh, h0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def stacked_gru_embed_finals_dp(tok_lt, w_ih, b_ih, w_hh, b_hh, h0,
                                mesh, axis: str = "data", precision=None):
    """Finals-only embed kernel over a pure-dp mesh."""
    h_seq = _embed_dp_fwd_impl(tok_lt, w_ih, b_ih, w_hh, b_hh, h0,
                               mesh, axis, precision)
    return h_seq[:, -1]


def _embed_fin_dp_vjp_fwd(tok_lt, w_ih, b_ih, w_hh, b_hh, h0, mesh, axis,
                          precision):
    h_seq, g4 = _embed_dp_fwd_impl(tok_lt, w_ih, b_ih, w_hh, b_hh, h0,
                                   mesh, axis, precision, stash_gates=True)
    return h_seq[:, -1], (tok_lt, w_ih, b_ih, w_hh, b_hh, h0, h_seq, g4)


def _embed_fin_dp_vjp_bwd(mesh, axis, precision, res, g_fin):
    tok_lt, w_ih, b_ih, w_hh, b_hh, h0, h_seq, g4 = res
    tk, b4, b3, rep = _embed_dp_specs(axis)
    Vp = w_ih.shape[1]

    def body(tok_, hseq_, g4_, h0_, g_, whh_):
        dwih, dbih, dw, db, dh0 = _bwd_embed_pallas(
            tok_, hseq_, g4_, h0_, g_, whh_, Vp, precision)
        return (jax.lax.psum(dwih, axis), jax.lax.psum(dbih, axis),
                jax.lax.psum(dw, axis), jax.lax.psum(db, axis), dh0)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, b4, b4, b3, b3, rep),
                      out_specs=(rep, rep, rep, rep, b3),
                      check_vma=False)
    dwih, dbih, dw, db, dh0 = f(tok_lt, h_seq, g4,
                                h0, g_fin.astype(h_seq.dtype), w_hh)
    return (_float0_like(tok_lt), dwih.astype(w_ih.dtype),
            dbih.astype(b_ih.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dh0.astype(h0.dtype))


stacked_gru_embed_finals_dp.defvjp(_embed_fin_dp_vjp_fwd,
                                   _embed_fin_dp_vjp_bwd)


# ---------------------------------------------------------------------------
# class-embedded variant returning the FULL h_seq: the sub-decoder use case
# ---------------------------------------------------------------------------
# The teacher-forced sub-decoders consume [track_onehot_t, z] per step
# (reference model_v2.py:99-116). The z half's projection is constant over
# time, and the track half is one-hot over a tiny class set (3 rhythm / 16
# note classes) — so the hoisted (L,T,B,3H) `pre` tensor the generic kernel
# needs (~25 MB/step at reference dims, plus its dpre twin in backward) is
# pure waste: per step the input projection is `w_emb[class_t] + pre_z`.
# This kernel embeds the class on-core (iota-compare one-hot @ VMEM-resident
# w_emb, padded to 128 rows) and adds the per-sequence pre_z; the backward
# accumulates dW_emb on-core and emits only the (L,B,3H) dpre_z. Unlike the
# encoder's finals-only embed kernel, the full h_seq carries cotangents
# (every step feeds the logits head), so the backward streams per-step g
# blocks instead of applying one final-state cotangent.


def _fwd_embed_seq_kernel(precision, lb, Cp, stash,
                          cls_ref, wemb_ref, prez_ref, w_ref, b_ref, h0_ref,
                          *refs):
    out_ref, g4_ref, h_c = refs if stash else (refs[0], None, refs[1])
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_c[:] = h0_ref[:].astype(F32)

    for j in range(lb):
        h = h_c[j]
        H = h.shape[-1]
        # prez is (B, G): broadcasts row-wise where the encoder kernel's
        # b_ih (1, G) broadcasts layer-wise — same add, richer operand
        pre_x, _ = _embed_pre_x(cls_ref[j, 0, 0], wemb_ref[j], prez_ref[j],
                                Cp, precision)
        pre_h = jax.lax.dot_general(
            h, w_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision
        ) + b_ref[j].astype(F32)
        r, z, n, h_new = _gates_f32(pre_x, pre_h, h)
        h_c[j] = h_new
        out_ref[j, 0] = h_new.astype(out_ref.dtype)
        if stash:
            g4_ref[j, 0] = jnp.concatenate(
                [r, z, n, pre_h[:, 2 * H:]], axis=-1).astype(g4_ref.dtype)


def _fwd_embed_seq_pallas(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                          precision=None, out_dtype=None,
                          stash_gates=False):
    """cls_lt (L, T, B) int32 class ids; w_emb (L, Cp, G) with Cp a lane
    multiple (pad rows zero); prez (L, B, G) = z @ w_z + b_ih, the
    per-sequence constant part of the input projection. Returns h_seq
    (L, T, B, H) (+ the (L, T, B, 4H) gate stash when `stash_gates`)."""
    L, T, B = cls_lt.shape
    H = h0.shape[-1]
    G = w_hh.shape[-1]
    Cp = w_emb.shape[1]
    out_dtype = out_dtype or w_emb.dtype
    lb = _pick_l_block_embed(L, B, H, G, Cp, w_emb.dtype.itemsize,
                             stash=stash_gates)
    seq_spec = pl.BlockSpec((lb, 1, B, H), lambda l, t: (l, t, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [seq_spec]
    out_shape = [jax.ShapeDtypeStruct((L, T, B, H), out_dtype)]
    if stash_gates:
        out_specs.append(pl.BlockSpec((lb, 1, B, 4 * H),
                                      lambda l, t: (l, t, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((L, T, B, 4 * H), out_dtype))
    outs = pl.pallas_call(
        functools.partial(_fwd_embed_seq_kernel, precision, lb, Cp,
                          stash_gates),
        grid=(L // lb, T),
        in_specs=[
            pl.BlockSpec((lb, 1, 1, B), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, Cp, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if stash_gates else out_specs[0],
        out_shape=out_shape if stash_gates else out_shape[0],
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(cls_lt[:, :, None, :], w_emb, prez, w_hh, b_hh[:, None, :], h0)
    return outs


def _embed_seq_bwd_need(lb, kt, B, H, G, Cp, itemsize):
    return lb * (H * G * itemsize               # w_hh (resident)
                 + (Cp + H) * G * 4             # dwemb + dwhh acc (f32)
                 + B * G * 4                    # dprez acc (f32)
                 + 2 * 2 * kt * B * H * itemsize  # hcur + hprevb (db)
                 + 2 * kt * B * 4 * H * itemsize  # g4 gate stash (db)
                 + 2 * kt * B * H * itemsize    # per-step g blocks (db)
                 + B * H * itemsize             # h0 (resident)
                 + 2 * kt * B * G * 4           # dpre_x + dpre_h stash
                 + kt * B * Cp * itemsize       # onehot block values
                 + 2 * B * H * 4)               # dh0 out + dh carry


def _pick_bwd_blocks_embed_seq(L, T, B, H, G, Cp, itemsize):
    budget = 72 * 1024 * 1024
    # sub-decoder T is small (16 short / 64 long corpus); larger kt means
    # fewer accumulator read-modify-writes — prefer the biggest fitting
    kt = _pick_t_block(
        T,
        lambda k: _embed_seq_bwd_need(1, k, B, H, G, Cp, itemsize) <= budget,
        prefs=(8, 4, 16, 2, 1))
    for lb in range(L, 0, -1):
        if L % lb:
            continue
        if _embed_seq_bwd_need(lb, kt, B, H, G, Cp, itemsize) <= budget:
            return lb, kt
    return 1, kt


def _bwd_embed_seq_kernel(precision, lb, kt, Cp,
                          cls_ref, hcur_ref, hprevb_ref, g4_ref, h0_ref,
                          g_ref, w_ref,
                          dwemb_ref, dprez_ref, dw_ref, db_ref, dh0_ref,
                          dh_c, dpx_c, dph_c):
    tb_rev = pl.program_id(1)
    TB = pl.num_programs(1)
    first_blk = tb_rev == TB - 1              # block containing t = 0

    @pl.when(tb_rev == 0)
    def _():
        dh_c[:] = jnp.zeros_like(dh_c)
        dwemb_ref[:] = jnp.zeros_like(dwemb_ref[:])
        dprez_ref[:] = jnp.zeros_like(dprez_ref[:])
        dw_ref[:] = jnp.zeros_like(dw_ref[:])
        db_ref[:] = jnp.zeros_like(db_ref[:])

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=F32,
                                   precision=precision)

    for j in range(lb):
        w = w_ref[j]
        B = dh_c.shape[1]
        H = dh_c.shape[2]
        G = w.shape[-1]
        onehot = _rows_onehot(cls_ref[j, :, 0, :], kt, B, Cp, w.dtype)
        g4 = g4_ref[j].astype(F32)                         # (kt, B, 4H)
        hcur = hcur_ref[j].astype(F32)
        gblk = g_ref[j].astype(F32)                        # (kt, B, H)
        h_prev0 = jnp.where(first_blk, h0_ref[j].astype(F32),
                            hprevb_ref[j, kt - 1].astype(F32))
        h_prev_blk = (h_prev0[None] if kt == 1 else jnp.concatenate(
            [h_prev0[None], hcur[: kt - 1]], axis=0))

        for s in range(kt - 1, -1, -1):       # sequential dh chain
            h_prev = h_prev_blk[s]
            r = g4[s, :, :H]
            z = g4[s, :, H:2 * H]
            n = g4[s, :, 2 * H:3 * H]
            hn_h = g4[s, :, 3 * H:]
            # full-sequence use case: EVERY step carries a cotangent
            dh_total = dh_c[j] + gblk[s]
            dpre_x, dpre_h, dhloc = _gate_bwd(dh_total, r, z, n, hn_h,
                                              h_prev)
            dh_c[j] = dhloc + dot(dpre_h, w, ((1,), (1,)))
            dpx_c[j, s] = dpre_x
            dph_c[j, s] = dpre_h
            if s == 0:
                @pl.when(first_blk)
                def _():
                    dh0_ref[j] = dh_c[j].astype(dh0_ref.dtype)

        dpx = dpx_c[j].reshape(kt * B, G)
        dph = dph_c[j].reshape(kt * B, G)
        dwemb_ref[j] += dot(onehot, dpx, ((0,), (0,)))
        dprez_ref[j] += jnp.sum(dpx_c[j], axis=0)          # (B, G)
        dw_ref[j] += dot(h_prev_blk.reshape(kt * B, H), dph, ((0,), (0,)))
        db_ref[j] += jnp.sum(dph, axis=0, keepdims=True)


def _bwd_embed_seq_pallas(cls_lt, h_seq, g4_seq, h0, g_seq, w_hh, Cp,
                          precision=None):
    """g_seq: per-step cotangents (L, T, B, H). Returns
    (dwemb (L,Cp,G), dprez (L,B,G), dw_hh, db_hh, dh0)."""
    L, T, B = cls_lt.shape
    H = h0.shape[-1]
    G = w_hh.shape[-1]
    lb, kt = _pick_bwd_blocks_embed_seq(L, T, B, H, G, Cp,
                                        h_seq.dtype.itemsize)
    TB = T // kt
    rev4 = lambda l, t: (l, TB - 1 - t, 0, 0)
    prevb = lambda l, t: (l, jnp.maximum(TB - 2 - t, 0), 0, 0)
    res = lambda l, t: (l, 0, 0)
    dwemb, dprez, dw, db, dh0 = pl.pallas_call(
        functools.partial(_bwd_embed_seq_kernel, precision, lb, kt, Cp),
        grid=(L // lb, TB),
        in_specs=[
            pl.BlockSpec((lb, kt, 1, B), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), prevb, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, 4 * H), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, kt, B, H), rev4, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), res, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((lb, Cp, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, 1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((lb, B, H), res, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, Cp, G), F32),
            jax.ShapeDtypeStruct((L, B, G), F32),
            jax.ShapeDtypeStruct((L, H, G), F32),
            jax.ShapeDtypeStruct((L, 1, G), F32),
            jax.ShapeDtypeStruct((L, B, H), F32),
        ],
        scratch_shapes=[pltpu.VMEM((lb, B, H), F32),
                        pltpu.VMEM((lb, kt, B, G), F32),
                        pltpu.VMEM((lb, kt, B, G), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(cls_lt[:, :, None, :], h_seq, h_seq, g4_seq, h0, g_seq, w_hh)
    return dwemb, dprez, dw, db[:, 0, :], dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def stacked_gru_embed_seq(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                          precision=None):
    """Fused stacked GRU over one-hot CLASS inputs plus a per-sequence
    constant input projection (pre_t = w_emb[class_t] + prez), returning
    the full h_seq (L, T, B, H) — the sub-decoder use case. cls_lt carries
    no gradient; grads flow to w_emb, prez (thence z and the w_ih z-rows
    outside), w_hh, b_hh, h0."""
    return _fwd_embed_seq_pallas(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                                 precision)


def _embed_seq_vjp_fwd(cls_lt, w_emb, prez, w_hh, b_hh, h0, precision):
    h_seq, g4 = _fwd_embed_seq_pallas(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                                      precision, stash_gates=True)
    return h_seq, (cls_lt, w_emb, prez, w_hh, b_hh, h0, h_seq, g4)


def _embed_seq_vjp_bwd(precision, res, g_seq):
    cls_lt, w_emb, prez, w_hh, b_hh, h0, h_seq, g4 = res
    dwemb, dprez, dw, db, dh0 = _bwd_embed_seq_pallas(
        cls_lt, h_seq, g4, h0, g_seq.astype(h_seq.dtype), w_hh,
        w_emb.shape[1], precision)
    return (_float0_like(cls_lt), dwemb.astype(w_emb.dtype),
            dprez.astype(prez.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dh0.astype(h0.dtype))


stacked_gru_embed_seq.defvjp(_embed_seq_vjp_fwd, _embed_seq_vjp_bwd)


def _embed_seq_dp_fwd_impl(cls_lt, w_emb, prez, w_hh, b_hh, h0, mesh, axis,
                           precision, stash_gates=False):
    from jax.sharding import PartitionSpec as P
    tk = P(None, None, axis)
    b4 = P(None, None, axis, None)
    b3 = P(None, axis, None)
    rep = P()
    f = jax.shard_map(
        functools.partial(_fwd_embed_seq_pallas, precision=precision,
                          stash_gates=stash_gates),
        mesh=mesh, in_specs=(tk, rep, b3, rep, rep, b3),
        out_specs=(b4, b4) if stash_gates else b4,
        check_vma=False)
    return f(cls_lt, w_emb, prez, w_hh, b_hh, h0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def stacked_gru_embed_seq_dp(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                             mesh, axis: str = "data", precision=None):
    """`stacked_gru_embed_seq` over a pure-dp mesh: classes/prez/h0
    batch-sharded, weights replicated, weight grads psum'd."""
    return _embed_seq_dp_fwd_impl(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                                  mesh, axis, precision)


def _embed_seq_dp_vjp_fwd(cls_lt, w_emb, prez, w_hh, b_hh, h0, mesh, axis,
                          precision):
    h_seq, g4 = _embed_seq_dp_fwd_impl(cls_lt, w_emb, prez, w_hh, b_hh, h0,
                                       mesh, axis, precision,
                                       stash_gates=True)
    return h_seq, (cls_lt, w_emb, prez, w_hh, b_hh, h0, h_seq, g4)


def _embed_seq_dp_vjp_bwd(mesh, axis, precision, res, g_seq):
    cls_lt, w_emb, prez, w_hh, b_hh, h0, h_seq, g4 = res
    from jax.sharding import PartitionSpec as P
    tk = P(None, None, axis)
    b4 = P(None, None, axis, None)
    b3 = P(None, axis, None)
    rep = P()
    Cp = w_emb.shape[1]

    def body(cls_, hseq_, g4_, h0_, g_, whh_):
        dwemb, dprez, dw, db, dh0 = _bwd_embed_seq_pallas(
            cls_, hseq_, g4_, h0_, g_, whh_, Cp, precision)
        return (jax.lax.psum(dwemb, axis), dprez,
                jax.lax.psum(dw, axis), jax.lax.psum(db, axis), dh0)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, b4, b4, b3, b4, rep),
                      out_specs=(rep, b3, rep, rep, b3),
                      check_vma=False)
    dwemb, dprez, dw, db, dh0 = f(cls_lt, h_seq, g4, h0,
                                  g_seq.astype(h_seq.dtype), w_hh)
    return (_float0_like(cls_lt), dwemb.astype(w_emb.dtype),
            dprez.astype(prez.dtype), dw.astype(w_hh.dtype),
            db.astype(b_hh.dtype), dh0.astype(h0.dtype))


stacked_gru_embed_seq_dp.defvjp(_embed_seq_dp_vjp_fwd,
                                _embed_seq_dp_vjp_bwd)


# ---------------------------------------------------------------------------
# fused 2-layer teacher decoder
# ---------------------------------------------------------------------------
# Teacher forcing decouples the decoder's 2 GRUCell layers, but running them
# as two consecutive L=1 kernels costs two T-step grids, an HBM round trip
# for h1_seq and pre2, and XLA-side pre-construction fusions. h2[t] only
# needs h1[t], so ONE kernel advances both layers in the same T-loop:
# per step it embeds the teacher token (iota-compare one-hot @ VMEM-resident
# w_tok + the precomputed z projection), updates layer 1, projects into
# layer 2 and updates it — with the reference's step-0 quirk (layer 2's
# previous hidden := layer 1's fresh state, reference model_v2.py:130-132)
# as a select on t==0. The backward recomputes both layers' gates from the
# h1/h2 residual streams and accumulates every weight/bias gradient in
# VMEM-resident outputs; only dpre_z (B,3H) and dh1_0 (B,H) leave per-batch.


def _dec_fwd_kernel(precision, Vp, stash, tok_ref, wtok_ref, prez_ref,
                    whh1_ref, bhh1_ref, wih2_ref, bih2_ref,
                    whh2_ref, bhh2_ref, h10_ref, *refs):
    if stash:
        h1_out, h2_out, g41_out, g42_out, h1_c, h2_c = refs
    else:
        h1_out, h2_out, h1_c, h2_c = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1_c[:] = h10_ref[:].astype(F32)
        h2_c[:] = jnp.zeros_like(h2_c)

    H = h1_c.shape[-1]
    h1 = h1_c[:]
    pre1, _ = _embed_pre_x(tok_ref[0, 0], wtok_ref[:], prez_ref[:],
                           Vp, precision)
    preh1 = jax.lax.dot_general(
        h1, whh1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bhh1_ref[:].astype(F32)
    r1, z1, n1, h1n = _gates_f32(pre1, preh1, h1)

    h2prev = jnp.where(t == 0, h1n, h2_c[:])
    pre2 = jax.lax.dot_general(
        h1n, wih2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bih2_ref[:].astype(F32)
    preh2 = jax.lax.dot_general(
        h2prev, whh2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bhh2_ref[:].astype(F32)
    r2, z2, n2, h2n = _gates_f32(pre2, preh2, h2prev)

    h1_c[:] = h1n
    h2_c[:] = h2n
    h1_out[0] = h1n.astype(h1_out.dtype)
    h2_out[0] = h2n.astype(h2_out.dtype)
    if stash:
        # [r, z, n, hn_h] per layer — lets the backward skip all four
        # recompute matmuls (pre1 embed, preh1, pre2, preh2)
        g41_out[0] = jnp.concatenate(
            [r1, z1, n1, preh1[:, 2 * H:]], axis=-1).astype(g41_out.dtype)
        g42_out[0] = jnp.concatenate(
            [r2, z2, n2, preh2[:, 2 * H:]], axis=-1).astype(g42_out.dtype)


def _dec_fwd_pallas(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                    whh2, bhh2, h1_0, precision=None, stash_gates=False):
    """tok_t (T, B) int32 teacher tokens; returns (h1_seq, h2_seq) (T,B,H),
    plus per-layer (T,B,4H) [r,z,n,hn_h] gate stashes when `stash_gates`
    (the training/VJP path)."""
    T, B = tok_t.shape
    H = h1_0.shape[-1]
    G = whh1.shape[-1]
    Vp = w_tok.shape[0]
    dt = w_tok.dtype
    res2 = lambda t: (0, 0)
    tok3 = lambda t: (t, 0, 0)
    out_specs = [
        pl.BlockSpec((1, B, H), tok3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), tok3, memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), dt),
                 jax.ShapeDtypeStruct((T, B, H), dt)]
    if stash_gates:
        g4_spec = pl.BlockSpec((1, B, 4 * H), tok3, memory_space=pltpu.VMEM)
        out_specs += [g4_spec, g4_spec]
        out_shape += [jax.ShapeDtypeStruct((T, B, 4 * H), dt)] * 2
    return pl.pallas_call(
        functools.partial(_dec_fwd_kernel, precision, Vp, stash_gates),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, B), tok3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res2, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), F32), pltpu.VMEM((B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_t[:, None, :], w_tok, pre_z, whh1, bhh1[None], wih2, bih2[None],
      whh2, bhh2[None], h1_0)


def _gate_bwd(dh_total, r, z, n, hn_h, h_prev):
    """Shared GRU gate backward: returns (dpre_x, dpre_h, dh_prev_local)
    where dh_prev_local excludes the pre_h @ w^T term. `hn_h` is the
    n-section of the hidden projection (pre_h[:, 2H:]) — the only part of
    pre_h the backward needs, which is why the gate stash keeps it."""
    dn = dh_total * (1.0 - z)
    dz = dh_total * (h_prev - n)
    dan = dn * (1.0 - n * n)
    dr = dan * hn_h
    dhn_h = dan * r
    dar = dr * r * (1.0 - r)
    daz = dz * z * (1.0 - z)
    dpre_x = jnp.concatenate([dar, daz, dan], axis=-1)
    dpre_h = jnp.concatenate([dar, daz, dhn_h], axis=-1)
    return dpre_x, dpre_h, dh_total * z


def _dec_bwd_chain(kt, first_blk, dot, dh2_head,
                   h1cur, h2cur, h1flat, g41_ref, g42_ref,
                   h1p_ref, h2p_ref, h10_ref,
                   whh1_ref, wih2_ref, whh2_ref, onehot, tok_fold,
                   dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                   dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref, dh10_ref,
                   dh1_c, dh2_c, s1x_c, s1h_c, s2x_c, s2h_c):
    """Shared tail of the two decoder backward kernels (_dec_bwd_kernel and
    _dec_bwd_ce_kernel): h_prev stream reconstruction from the stash, the
    reversed sequential dh chains over the block, and the once-per-block
    batched accumulator updates. The heads differ only in `dh2_head(s)` —
    the per-step output-side cotangent into layer 2 — and the dW_tok
    contraction (`onehot` width and the `tok_fold(s1x)` n_rep folding of
    dpre1 over token-sharing batch copies differ)."""
    B = dh1_c.shape[0]
    H = dh1_c.shape[1]
    G = whh1_ref.shape[-1]
    g41 = g41_ref[:].astype(F32)                           # (kt, B, 4H)
    g42 = g42_ref[:].astype(F32)
    h1prev0 = jnp.where(first_blk, h10_ref[:].astype(F32),
                        h1p_ref[kt - 1].astype(F32))
    h1prev_blk = (h1prev0[None] if kt == 1 else jnp.concatenate(
        [h1prev0[None], h1cur[: kt - 1]], axis=0))
    # reference t==0 quirk: layer 2's previous hidden := layer 1's fresh
    # state (model_v2.py:130-132)
    h2prev0 = jnp.where(first_blk, h1cur[0], h2p_ref[kt - 1].astype(F32))
    h2prev_blk = (h2prev0[None] if kt == 1 else jnp.concatenate(
        [h2prev0[None], h2cur[: kt - 1]], axis=0))

    # ---- sequential dh chains over the block (reversed) ----
    for s in range(kt - 1, -1, -1):
        r2 = g42[s, :, :H]
        z2 = g42[s, :, H:2 * H]
        n2 = g42[s, :, 2 * H:3 * H]
        dh2 = dh2_head(s) + dh2_c[:]
        dpre2x, dpreh2, dh2loc = _gate_bwd(dh2, r2, z2, n2,
                                           g42[s, :, 3 * H:],
                                           h2prev_blk[s])
        dh2prev = dh2loc + dot(dpreh2, whh2_ref[:], ((1,), (1,)))
        s2x_c[s] = dpre2x
        s2h_c[s] = dpreh2

        # dh1: from layer2's input projection, the t==0 quirk, and carry
        dh1 = dh1_c[:] + dot(dpre2x, wih2_ref[:], ((1,), (1,)))
        if s == 0:
            dh1 = dh1 + jnp.where(first_blk, dh2prev,
                                  jnp.zeros_like(dh2prev))
            dh2_c[:] = jnp.where(first_blk, jnp.zeros_like(dh2prev),
                                 dh2prev)
        else:
            dh2_c[:] = dh2prev

        r1 = g41[s, :, :H]
        z1 = g41[s, :, H:2 * H]
        n1 = g41[s, :, 2 * H:3 * H]
        dpre1x, dpreh1, dh1loc = _gate_bwd(dh1, r1, z1, n1,
                                           g41[s, :, 3 * H:],
                                           h1prev_blk[s])
        dh1_c[:] = dh1loc + dot(dpreh1, whh1_ref[:], ((1,), (1,)))
        s1x_c[s] = dpre1x
        s1h_c[s] = dpreh1
        if s == 0:
            @pl.when(first_blk)
            def _():
                dh10_ref[:] = dh1_c[:].astype(dh10_ref.dtype)

    # ---- ONE accumulator update per block: batched dW matmuls ----
    s1x = s1x_c[:].reshape(kt * B, G)
    s1h = s1h_c[:].reshape(kt * B, G)
    s2x = s2x_c[:].reshape(kt * B, G)
    s2h = s2h_c[:].reshape(kt * B, G)
    s1x_tok = tok_fold(s1x)
    dwtok_ref[:] += dot(onehot, s1x_tok, ((0,), (0,)))
    dprez_ref[:] += jnp.sum(s1x_c[:], axis=0)
    dwhh1_ref[:] += dot(h1prev_blk.reshape(kt * B, H), s1h, ((0,), (0,)))
    dbhh1_ref[:] += jnp.sum(s1h, axis=0, keepdims=True)
    dwih2_ref[:] += dot(h1flat, s2x, ((0,), (0,)))
    dbih2_ref[:] += jnp.sum(s2x, axis=0, keepdims=True)
    dwhh2_ref[:] += dot(h2prev_blk.reshape(kt * B, H), s2h, ((0,), (0,)))
    dbhh2_ref[:] += jnp.sum(s2h, axis=0, keepdims=True)


def _dec_bwd_kernel(precision, kt, Vp,
                    tok_ref, h1_ref, h1p_ref, h2_ref, h2p_ref,
                    g41_ref, g42_ref, g2_ref,
                    whh1_ref, wih2_ref, whh2_ref, h10_ref,
                    dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                    dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref, dh10_ref,
                    dh1_c, dh2_c, s1x_c, s1h_c, s2x_c, s2h_c):
    tb = pl.program_id(0)                     # reversed block index
    TB = pl.num_programs(0)
    first_blk = tb == TB - 1                  # block containing t = 0

    @pl.when(tb == 0)
    def _():
        dh1_c[:] = jnp.zeros_like(dh1_c)
        dh2_c[:] = jnp.zeros_like(dh2_c)
        for ref in (dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                    dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref):
            ref[:] = jnp.zeros_like(ref[:])

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=F32,
                                   precision=precision)

    B = dh1_c.shape[0]
    H = dh1_c.shape[1]
    h1cur = h1_ref[:].astype(F32)                          # (kt, B, H)
    h2cur = h2_ref[:].astype(F32)
    h1flat = h1cur.reshape(kt * B, H)

    # gates come from the forward's stash; only the h_prev streams and the
    # dW_tok onehot are (re)built — both in _dec_bwd_chain
    onehot = _rows_onehot(tok_ref[:, 0, :], kt, B, Vp, whh1_ref.dtype)
    _dec_bwd_chain(kt, first_blk, dot,
                   lambda s: g2_ref[s].astype(F32),
                   h1cur, h2cur, h1flat, g41_ref, g42_ref,
                   h1p_ref, h2p_ref, h10_ref,
                   whh1_ref, wih2_ref, whh2_ref,
                   onehot, lambda s1x: s1x,
                   dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                   dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref, dh10_ref,
                   dh1_c, dh2_c, s1x_c, s1h_c, s2x_c, s2h_c)


def _dec_bwd_pallas(tok_t, h1_seq, h2_seq, g41_seq, g42_seq, g2_seq,
                    whh1, wih2, whh2, h1_0, Vp, precision=None):
    T, B = tok_t.shape
    H = h1_0.shape[-1]
    G = whh1.shape[-1]
    kt = _pick_dec_t_block(T, B, H, G, Vp, h1_seq.dtype.itemsize)
    TB = T // kt
    rev_tok = lambda t: (TB - 1 - t, 0, 0)
    rev = lambda t: (TB - 1 - t, 0, 0)
    prev = lambda t: (jnp.maximum(TB - 2 - t, 0), 0, 0)
    res = lambda t: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_dec_bwd_kernel, precision, kt, Vp),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((kt, 1, B), rev_tok, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, 4 * H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Vp, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, G), F32),
            jax.ShapeDtypeStruct((B, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((B, H), F32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), F32), pltpu.VMEM((B, H), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_t[:, None, :], h1_seq, h1_seq, h2_seq, h2_seq, g41_seq, g42_seq,
      g2_seq, whh1, wih2, whh2, h1_0)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10) = outs
    return (dwtok, dprez, dwhh1, dbhh1[0], dwih2, dbih2[0],
            dwhh2, dbhh2[0], dh10)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _dec_teacher_core(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                      whh2, bhh2, h1_0, precision=None):
    h1_seq, h2_seq = _dec_fwd_pallas(tok_t, w_tok, pre_z, whh1, bhh1,
                                     wih2, bih2, whh2, bhh2, h1_0, precision)
    return h2_seq


def _dec_vjp_fwd(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                 whh2, bhh2, h1_0, precision):
    h1_seq, h2_seq, g41, g42 = _dec_fwd_pallas(
        tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0,
        precision, stash_gates=True)
    return h2_seq, (tok_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z,
                    whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0)


def _dec_vjp_bwd(precision, res, g2):
    (tok_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z, whh1, bhh1,
     wih2, bih2, whh2, bhh2, h1_0) = res
    grads = _dec_bwd_pallas(tok_t, h1_seq, h2_seq, g41, g42,
                            g2.astype(h2_seq.dtype),
                            whh1, wih2, whh2, h1_0, w_tok.shape[0],
                            precision)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10) = grads
    return (_float0_like(tok_t), dwtok.astype(w_tok.dtype),
            dprez.astype(pre_z.dtype), dwhh1.astype(whh1.dtype),
            dbhh1.astype(bhh1.dtype), dwih2.astype(wih2.dtype),
            dbih2.astype(bih2.dtype), dwhh2.astype(whh2.dtype),
            dbhh2.astype(bhh2.dtype), dh10.astype(h1_0.dtype))


_dec_teacher_core.defvjp(_dec_vjp_fwd, _dec_vjp_bwd)


# --- CE-fused variant: the logits head + log_softmax + target gather run
# in-kernel too, so the (B,T,V) logits tensor (17.5MB + softmax round
# trips) never exists. Primal output is the per-position NLL (T,B); the
# backward recomputes logits from the h2 residual and accumulates
# dW_out/db_out on-core. Matches losses/elbo.py::nll_mean semantics
# (padding positions included; caller takes the mean).


def _ce_from_h2(h2n, tgt, wout_ref, bout_ref, Vp, precision):
    B = h2n.shape[0]
    logits = jax.lax.dot_general(
        h2n, wout_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bout_ref[:].astype(F32)                       # pads biased -1e30
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    col = jax.lax.broadcasted_iota(jnp.int32, (B, Vp), 1)
    tgt_oh = (col == tgt[:, None])
    logit_t = jnp.sum(jnp.where(tgt_oh, logits, 0.0), axis=-1)
    return lse[:, 0] - logit_t, logits, lse, tgt_oh


def _mask_masses(logits, ranges):
    """Per-range softmax probability masses: logits (N, Vp) -> list of (N,)
    sums of softmax(logits) over each static [lo, hi) vocab range. Ranges
    are built with iota compares (cheap VPU work, no mask operands)."""
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    return [jnp.sum(jnp.where((col >= lo) & (col < hi), p, 0.0), axis=-1)
            for lo, hi in ranges], p


def _dec_fwd_ce_kernel(precision, Vp, stash, head, n_rep, tok_ref, tgt_ref,
                       wtok_ref, prez_ref, whh1_ref, bhh1_ref, wih2_ref,
                       bih2_ref, whh2_ref, bhh2_ref, h10_ref, wout_ref,
                       bout_ref, *refs):
    if stash:
        h1_out, h2_out, ce_out, g41_out, g42_out, h1_c, h2_c = refs
    else:
        h1_out, h2_out, ce_out, h1_c, h2_c = refs
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1_c[:] = h10_ref[:].astype(F32)
        h2_c[:] = jnp.zeros_like(h2_c)

    H = h1_c.shape[-1]
    h1 = h1_c[:]
    if n_rep == 1:
        pre1, _ = _embed_pre_x(tok_ref[0, 0], wtok_ref[:], prez_ref[:],
                               Vp, precision)
    else:
        # the n_rep batch copies share the teacher tokens (GLSR stacks 4
        # perturbations of z over the SAME sequence): embed once at B/n_rep
        # rows and tile — cuts the (B,Vp)@(Vp,G) embed matmul n_rep-fold
        tok = tok_ref[0, 0]                                    # (B/n_rep,)
        col = jax.lax.broadcasted_iota(jnp.int32, (tok.shape[0], Vp), 1)
        onehot = (col == tok[:, None]).astype(wtok_ref.dtype)
        emb = jax.lax.dot_general(
            onehot, wtok_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision)
        pre1 = (jnp.concatenate([emb] * n_rep, axis=0)
                + prez_ref[:].astype(F32))
    preh1 = jax.lax.dot_general(
        h1, whh1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bhh1_ref[:].astype(F32)
    r1, z1, n1, h1n = _gates_f32(pre1, preh1, h1)

    h2prev = jnp.where(t == 0, h1n, h2_c[:])
    pre2 = jax.lax.dot_general(
        h1n, wih2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bih2_ref[:].astype(F32)
    preh2 = jax.lax.dot_general(
        h2prev, whh2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=F32, precision=precision
    ) + bhh2_ref[:].astype(F32)
    r2, z2, n2, h2n = _gates_f32(pre2, preh2, h2prev)

    h1_c[:] = h1n
    h2_c[:] = h2n
    h1_out[0] = h1n.astype(h1_out.dtype)
    h2_out[0] = h2n.astype(h2_out.dtype)
    if head == "ce":
        ce, _, _, _ = _ce_from_h2(h2n, tgt_ref[0, 0], wout_ref, bout_ref,
                                  Vp, precision)
        ce_out[0, 0] = ce.astype(ce_out.dtype)
    else:                                    # head = static vocab ranges
        logits = jax.lax.dot_general(
            h2n, wout_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=F32, precision=precision
        ) + bout_ref[:].astype(F32)
        masses, _ = _mask_masses(logits, head)
        for k, mk in enumerate(masses):
            ce_out[0, k] = mk.astype(ce_out.dtype)
    if stash:
        # [r, z, n, hn_h] per layer — lets the backward skip all four
        # recompute matmuls (pre1 embed, preh1, pre2, preh2)
        g41_out[0] = jnp.concatenate(
            [r1, z1, n1, preh1[:, 2 * H:]], axis=-1).astype(g41_out.dtype)
        g42_out[0] = jnp.concatenate(
            [r2, z2, n2, preh2[:, 2 * H:]], axis=-1).astype(g42_out.dtype)


def _dec_fwd_ce_pallas(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                       whh2, bhh2, h1_0, w_out, b_out, precision=None,
                       stash_gates=False, head="ce", n_rep=1):
    T, B0 = tok_t.shape
    B = B0 * n_rep                       # batch rows; tokens shared n_rep-fold
    assert n_rep == 1 or head != "ce", "CE head needs per-row targets"
    H = h1_0.shape[-1]
    G = whh1.shape[-1]
    Vp = w_tok.shape[0]
    dt = w_tok.dtype
    K = 1 if head == "ce" else len(head)
    res2 = lambda t: (0, 0)
    tok3 = lambda t: (t, 0, 0)
    out_specs = [
        pl.BlockSpec((1, B, H), tok3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, H), tok3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, B), tok3, memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((T, B, H), dt),
                 jax.ShapeDtypeStruct((T, B, H), dt),
                 jax.ShapeDtypeStruct((T, K, B), F32)]
    if stash_gates:
        g4_spec = pl.BlockSpec((1, B, 4 * H), tok3, memory_space=pltpu.VMEM)
        out_specs += [g4_spec, g4_spec]
        out_shape += [jax.ShapeDtypeStruct((T, B, 4 * H), dt)] * 2
    return pl.pallas_call(
        functools.partial(_dec_fwd_ce_kernel, precision, Vp, stash_gates,
                          head, n_rep),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 1, B0), tok3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B0), tok3, memory_space=pltpu.VMEM),
            pl.BlockSpec((Vp, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), res2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), res2, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, H), F32), pltpu.VMEM((B, H), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_t[:, None, :], tgt_t[:, None, :], w_tok, pre_z, whh1, bhh1[None],
      wih2, bih2[None], whh2, bhh2[None], h1_0, w_out, b_out[None])


def _dec_bwd_need(kt, B, H, G, Vp, itemsize):
    wacc = (Vp * G + 3 * H * G + H * Vp + B * G) * (itemsize + 4)
    return (wacc                                   # weights + f32 accs
            + 2 * 4 * kt * B * H * itemsize        # h1/h2 cur+prev (db)
            + 2 * 2 * kt * B * 4 * H * itemsize    # g41/g42 stash (db)
            + 4 * kt * B * G * 4                   # dpre stashes (f32)
            + 3 * kt * B * Vp * 4                  # logits/dlogits/onehot
            + 4 * B * H * 4)                       # carries + dh10


def _pick_dec_t_block(T, B, H, G, Vp, itemsize):
    budget = 72 * 1024 * 1024
    return _pick_t_block(
        T, lambda k: _dec_bwd_need(k, B, H, G, Vp, itemsize) <= budget,
        prefs=(2, 5, 4, 1))


def _dec_bwd_ce_kernel(precision, kt, Vp, head, n_rep,
                       tok_ref, tgt_ref, h1_ref, h1p_ref, h2_ref, h2p_ref,
                       g41_ref, g42_ref, gce_ref,
                       whh1_ref, wih2_ref, whh2_ref, h10_ref,
                       wout_ref, bout_ref,
                       dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                       dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref, dh10_ref,
                       dwout_ref, dbout_ref,
                       dh1_c, dh2_c, s1x_c, s1h_c, s2x_c, s2h_c):
    tb = pl.program_id(0)                     # reversed block index
    TB = pl.num_programs(0)
    first_blk = tb == TB - 1                  # block containing t = 0

    @pl.when(tb == 0)
    def _():
        dh1_c[:] = jnp.zeros_like(dh1_c)
        dh2_c[:] = jnp.zeros_like(dh2_c)
        for ref in (dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                    dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref,
                    dwout_ref, dbout_ref):
            ref[:] = jnp.zeros_like(ref[:])

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=F32,
                                   precision=precision)

    B = dh1_c.shape[0]
    H = dh1_c.shape[1]
    G = whh1_ref.shape[-1]
    h1cur = h1_ref[:].astype(F32)                          # (kt, B, H)
    h2cur = h2_ref[:].astype(F32)
    h1flat = h1cur.reshape(kt * B, H)
    h2flat = h2cur.reshape(kt * B, H)

    # ---- output head (CE or masked-mass): independent of the dh chains,
    # fully batched over the block ----
    logits = dot(h2flat, wout_ref[:], ((1,), (0,))) + bout_ref[:].astype(F32)
    if head == "ce":
        m = jnp.max(logits, axis=-1, keepdims=True)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1,
                                  keepdims=True))
        tgt_oh = _rows_onehot(tgt_ref[:, 0, :], kt, B, Vp)
        g_ce = _rows_col(gce_ref[:, 0, :].astype(F32), kt)
        dlogits = (jnp.exp(logits - lse) - tgt_oh.astype(F32)) * g_ce
    else:
        # d(sum_{v in mask_k} p_v)/dlogit_j = p_j (1[j in mask_k] - mass_k)
        masses, p = _mask_masses(logits, head)
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        acc = jnp.zeros_like(logits)
        for k, (lo, hi) in enumerate(head):
            g_k = _rows_col(gce_ref[:, k, :].astype(F32), kt)   # (kt*B, 1)
            ind = jnp.where((col >= lo) & (col < hi), 1.0, 0.0)
            acc = acc + g_k * (ind - masses[k][:, None])
        dlogits = p * acc
    dwout_ref[:] += dot(h2flat, dlogits, ((0,), (0,)))
    dbout_ref[:] += jnp.sum(dlogits, axis=0, keepdims=True)
    dh2ce = dot(dlogits, wout_ref[:], ((1,), (1,))).reshape(kt, B, H)

    # gates come from the forward's stash; only the h_prev streams and the
    # dW_tok onehot are (re)built (the latter at B/n_rep rows — the n_rep
    # batch copies share their teacher tokens)
    B0 = B // n_rep
    onehot = _rows_onehot(tok_ref[:, 0, :], kt, B0, Vp, whh1_ref.dtype)

    def tok_fold(s1x):
        if n_rep == 1:
            return s1x
        # fold dpre1 over the n_rep token-sharing copies BEFORE the dW_tok
        # matmul: onehot is identical per copy, so dW_tok = onehot^T @
        # (sum over copies) — an n_rep-fold smaller contraction
        folded = s1x_c[:, 0:B0, :]
        for c in range(1, n_rep):
            folded = folded + s1x_c[:, c * B0:(c + 1) * B0, :]
        return folded.reshape(kt * B0, G)

    _dec_bwd_chain(kt, first_blk, dot,
                   lambda s: dh2ce[s],
                   h1cur, h2cur, h1flat, g41_ref, g42_ref,
                   h1p_ref, h2p_ref, h10_ref,
                   whh1_ref, wih2_ref, whh2_ref, onehot, tok_fold,
                   dwtok_ref, dprez_ref, dwhh1_ref, dbhh1_ref,
                   dwih2_ref, dbih2_ref, dwhh2_ref, dbhh2_ref, dh10_ref,
                   dh1_c, dh2_c, s1x_c, s1h_c, s2x_c, s2h_c)


def _dec_bwd_ce_pallas(tok_t, tgt_t, h1_seq, h2_seq, g41_seq, g42_seq,
                       g_ce, whh1, wih2, whh2, h1_0,
                       w_out, b_out, Vp, precision=None, head="ce",
                       n_rep=1):
    T, B0 = tok_t.shape
    B = B0 * n_rep
    H = h1_0.shape[-1]
    G = whh1.shape[-1]
    K = 1 if head == "ce" else len(head)
    kt = _pick_dec_t_block(T, B, H, G, Vp, h1_seq.dtype.itemsize)
    TB = T // kt
    rev3 = lambda t: (TB - 1 - t, 0, 0)
    prev = lambda t: (jnp.maximum(TB - 2 - t, 0), 0, 0)
    res = lambda t: (0, 0)
    outs = pl.pallas_call(
        functools.partial(_dec_bwd_ce_kernel, precision, kt, Vp, head,
                          n_rep),
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((kt, 1, B0), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 1, B0), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, H), prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, 4 * H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, B, 4 * H), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, K, B), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), res, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Vp, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, Vp), res, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp), res, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Vp, G), F32),
            jax.ShapeDtypeStruct((B, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((H, G), F32),
            jax.ShapeDtypeStruct((1, G), F32),
            jax.ShapeDtypeStruct((B, H), F32),
            jax.ShapeDtypeStruct((H, Vp), F32),
            jax.ShapeDtypeStruct((1, Vp), F32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), F32), pltpu.VMEM((B, H), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32),
                        pltpu.VMEM((kt, B, G), F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=INTERPRET,
    )(tok_t[:, None, :], tgt_t[:, None, :], h1_seq, h1_seq, h2_seq, h2_seq,
      g41_seq, g42_seq, g_ce[:, None, :] if head == "ce" else g_ce,
      whh1, wih2, whh2, h1_0, w_out, b_out[None])
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
     dwout, dbout) = outs
    return (dwtok, dprez, dwhh1, dbhh1[0], dwih2, dbih2[0],
            dwhh2, dbhh2[0], dh10, dwout, dbout[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def _dec_nll_core(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                  whh2, bhh2, h1_0, wout_bout, precision=None):
    w_out, b_out = wout_bout
    _, _, ce = _dec_fwd_ce_pallas(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1,
                                  wih2, bih2, whh2, bhh2, h1_0,
                                  w_out, b_out, precision)
    return ce[:, 0, :]                                       # (T, B)


def _dec_nll_vjp_fwd(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                     whh2, bhh2, h1_0, wout_bout, precision):
    w_out, b_out = wout_bout
    h1_seq, h2_seq, ce, g41, g42 = _dec_fwd_ce_pallas(
        tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2,
        h1_0, w_out, b_out, precision, stash_gates=True)
    return ce[:, 0, :], (tok_t, tgt_t, h1_seq, h2_seq, g41, g42, w_tok,
                         pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0,
                         w_out, b_out)


def _dec_nll_vjp_bwd(precision, res, g_ce):
    (tok_t, tgt_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z, whh1, bhh1,
     wih2, bih2, whh2, bhh2, h1_0, w_out, b_out) = res
    grads = _dec_bwd_ce_pallas(tok_t, tgt_t, h1_seq, h2_seq, g41, g42,
                               g_ce.astype(F32),
                               whh1, wih2, whh2, h1_0,
                               w_out, b_out, w_tok.shape[0], precision)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
     dwout, dbout) = grads
    return (_float0_like(tok_t), _float0_like(tgt_t),
            dwtok.astype(w_tok.dtype), dprez.astype(pre_z.dtype),
            dwhh1.astype(whh1.dtype), dbhh1.astype(bhh1.dtype),
            dwih2.astype(wih2.dtype), dbih2.astype(bih2.dtype),
            dwhh2.astype(whh2.dtype), dbhh2.astype(bhh2.dtype),
            dh10.astype(h1_0.dtype),
            (dwout.astype(w_out.dtype), dbout.astype(b_out.dtype)))


_dec_nll_core.defvjp(_dec_nll_vjp_fwd, _dec_nll_vjp_bwd)


# --- masked-mass variant (GLSR): same fused decode, but the head emits K
# per-step masked softmax masses out[t,k,b] = sum_{v in range_k} p(v)
# instead of the target NLL. The GLSR regularizer only consumes these
# masses (note-on and time-separator probability per step, reference
# trainer_glsr.py:123-139), so the (B,T,V) log-prob tensor for its four
# perturbation decodes never exists in HBM; the backward recomputes logits
# from the h2 residual and folds d(mass)/dlogits in on-core.


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _dec_mask_core(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                   whh2, bhh2, h1_0, wout_bout, ranges, n_rep=1,
                   precision=None):
    w_out, b_out = wout_bout
    _, _, mk = _dec_fwd_ce_pallas(tok_t, tok_t, w_tok, pre_z, whh1, bhh1,
                                  wih2, bih2, whh2, bhh2, h1_0,
                                  w_out, b_out, precision, head=ranges,
                                  n_rep=n_rep)
    return mk                                                # (T, K, B)


def _dec_mask_vjp_fwd(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                      whh2, bhh2, h1_0, wout_bout, ranges, n_rep,
                      precision):
    w_out, b_out = wout_bout
    h1_seq, h2_seq, mk, g41, g42 = _dec_fwd_ce_pallas(
        tok_t, tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2,
        h1_0, w_out, b_out, precision, stash_gates=True, head=ranges,
        n_rep=n_rep)
    return mk, (tok_t, h1_seq, h2_seq, g41, g42, w_tok,
                pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0,
                w_out, b_out)


def _dec_mask_vjp_bwd(ranges, n_rep, precision, res, g_mk):
    (tok_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z, whh1, bhh1,
     wih2, bih2, whh2, bhh2, h1_0, w_out, b_out) = res
    grads = _dec_bwd_ce_pallas(tok_t, tok_t, h1_seq, h2_seq, g41, g42,
                               g_mk.astype(F32),
                               whh1, wih2, whh2, h1_0,
                               w_out, b_out, w_tok.shape[0], precision,
                               head=ranges, n_rep=n_rep)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
     dwout, dbout) = grads
    return (_float0_like(tok_t),
            dwtok.astype(w_tok.dtype), dprez.astype(pre_z.dtype),
            dwhh1.astype(whh1.dtype), dbhh1.astype(bhh1.dtype),
            dwih2.astype(wih2.dtype), dbih2.astype(bih2.dtype),
            dwhh2.astype(whh2.dtype), dbhh2.astype(bhh2.dtype),
            dh10.astype(h1_0.dtype),
            (dwout.astype(w_out.dtype), dbout.astype(b_out.dtype)))


_dec_mask_core.defvjp(_dec_mask_vjp_fwd, _dec_mask_vjp_bwd)


# -- dp composition of the CE-fused decoder: tokens/targets and the
# per-batch pre_z/h1_0 are sharded over `data`, weights replicated, weight
# grads psum'd — the same recipe as _dec_teacher_core_dp, extended with the
# (H,Vp) logits head. Per-shard each device runs the full fused kernel on
# its batch slice; the (B,T,V) log-prob tensor never exists on any device.


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _dec_nll_core_dp(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                     whh2, bhh2, h1_0, wout_bout, mesh, axis="data",
                     precision=None):
    from jax.sharding import PartitionSpec as P
    tk, bb, rep = P(None, axis), P(axis, None), P()
    w_out, b_out = wout_bout

    def body(tok_, tgt_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_,
             bhh2_, h10_, wout_, bout_):
        _, _, ce = _dec_fwd_ce_pallas(tok_, tgt_, wtok_, prez_, whh1_, bhh1_,
                                      wih2_, bih2_, whh2_, bhh2_, h10_,
                                      wout_, bout_, precision)
        return ce[:, 0, :]

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, tk, rep, bb, rep, rep, rep, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=tk, check_vma=False)
    return f(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2,
             h1_0, w_out, b_out)


def _dec_nll_dp_vjp_fwd(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                        whh2, bhh2, h1_0, wout_bout, mesh, axis, precision):
    from jax.sharding import PartitionSpec as P
    tk, b4, bb, rep = (P(None, axis), P(None, axis, None), P(axis, None),
                       P())
    w_out, b_out = wout_bout

    def body(tok_, tgt_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_,
             bhh2_, h10_, wout_, bout_):
        h1s, h2s, ce, g41, g42 = _dec_fwd_ce_pallas(
            tok_, tgt_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_,
            bhh2_, h10_, wout_, bout_, precision, stash_gates=True)
        return h1s, h2s, ce[:, 0, :], g41, g42

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, tk, rep, bb, rep, rep, rep, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=(b4, b4, tk, b4, b4), check_vma=False)
    h1_seq, h2_seq, ce, g41, g42 = f(tok_t, tgt_t, w_tok, pre_z, whh1, bhh1,
                                     wih2, bih2, whh2, bhh2, h1_0,
                                     w_out, b_out)
    return ce, (tok_t, tgt_t, h1_seq, h2_seq, g41, g42, w_tok, whh1,
                wih2, whh2, h1_0, w_out, b_out, pre_z, bhh1, bih2, bhh2)


def _dec_nll_dp_vjp_bwd(mesh, axis, precision, res, g_ce):
    (tok_t, tgt_t, h1_seq, h2_seq, g41, g42, w_tok, whh1,
     wih2, whh2, h1_0, w_out, b_out, pre_z, bhh1, bih2, bhh2) = res
    from jax.sharding import PartitionSpec as P
    tk, b4, bb, rep = (P(None, axis), P(None, axis, None), P(axis, None),
                       P())
    Vp = w_tok.shape[0]

    def body(tok_, tgt_, h1s_, h2s_, g41_, g42_, g_, whh1_, wih2_,
             whh2_, h10_, wout_, bout_):
        out = _dec_bwd_ce_pallas(tok_, tgt_, h1s_, h2s_, g41_, g42_, g_,
                                 whh1_, wih2_, whh2_,
                                 h10_, wout_, bout_, Vp, precision)
        (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
         dwout, dbout) = out
        return (jax.lax.psum(dwtok, axis), dprez,
                jax.lax.psum(dwhh1, axis), jax.lax.psum(dbhh1, axis),
                jax.lax.psum(dwih2, axis), jax.lax.psum(dbih2, axis),
                jax.lax.psum(dwhh2, axis), jax.lax.psum(dbhh2, axis), dh10,
                jax.lax.psum(dwout, axis), jax.lax.psum(dbout, axis))

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, tk, b4, b4, b4, b4, tk, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=(rep, bb, rep, rep, rep, rep, rep, rep, bb,
                                 rep, rep),
                      check_vma=False)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
     dwout, dbout) = f(tok_t, tgt_t, h1_seq, h2_seq, g41, g42,
                       g_ce.astype(F32),
                       whh1, wih2, whh2, h1_0, w_out, b_out)
    return (_float0_like(tok_t), _float0_like(tgt_t),
            dwtok.astype(w_tok.dtype), dprez.astype(pre_z.dtype),
            dwhh1.astype(whh1.dtype), dbhh1.astype(bhh1.dtype),
            dwih2.astype(wih2.dtype), dbih2.astype(bih2.dtype),
            dwhh2.astype(whh2.dtype), dbhh2.astype(bhh2.dtype),
            dh10.astype(h1_0.dtype),
            (dwout.astype(w_out.dtype), dbout.astype(b_out.dtype)))


_dec_nll_core_dp.defvjp(_dec_nll_dp_vjp_fwd, _dec_nll_dp_vjp_bwd)


# dp composition of the masked-mass decoder: same sharding recipe as the
# CE variant; the (T, K, B) masses are batch-sharded on their LAST axis.


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _dec_mask_core_dp(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                      whh2, bhh2, h1_0, wout_bout, ranges, mesh,
                      axis="data", precision=None):
    from jax.sharding import PartitionSpec as P
    tk, mk3, bb, rep = (P(None, axis), P(None, None, axis), P(axis, None),
                        P())
    w_out, b_out = wout_bout

    def body(tok_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_,
             bhh2_, h10_, wout_, bout_):
        _, _, mk = _dec_fwd_ce_pallas(tok_, tok_, wtok_, prez_, whh1_,
                                      bhh1_, wih2_, bih2_, whh2_, bhh2_,
                                      h10_, wout_, bout_, precision,
                                      head=ranges)
        return mk

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, rep, bb, rep, rep, rep, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=mk3, check_vma=False)
    return f(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2,
             h1_0, w_out, b_out)


def _dec_mask_dp_vjp_fwd(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                         whh2, bhh2, h1_0, wout_bout, ranges, mesh, axis,
                         precision):
    from jax.sharding import PartitionSpec as P
    tk, mk3, b4, bb, rep = (P(None, axis), P(None, None, axis),
                            P(None, axis, None), P(axis, None), P())
    w_out, b_out = wout_bout

    def body(tok_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_,
             bhh2_, h10_, wout_, bout_):
        return _dec_fwd_ce_pallas(tok_, tok_, wtok_, prez_, whh1_, bhh1_,
                                  wih2_, bih2_, whh2_, bhh2_, h10_,
                                  wout_, bout_, precision,
                                  stash_gates=True, head=ranges)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, rep, bb, rep, rep, rep, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=(b4, b4, mk3, b4, b4), check_vma=False)
    h1_seq, h2_seq, mk, g41, g42 = f(tok_t, w_tok, pre_z, whh1, bhh1,
                                     wih2, bih2, whh2, bhh2, h1_0,
                                     w_out, b_out)
    return mk, (tok_t, h1_seq, h2_seq, g41, g42, w_tok, whh1,
                wih2, whh2, h1_0, w_out, b_out, pre_z, bhh1, bih2, bhh2)


def _dec_mask_dp_vjp_bwd(ranges, mesh, axis, precision, res, g_mk):
    (tok_t, h1_seq, h2_seq, g41, g42, w_tok, whh1,
     wih2, whh2, h1_0, w_out, b_out, pre_z, bhh1, bih2, bhh2) = res
    from jax.sharding import PartitionSpec as P
    tk, mk3, b4, bb, rep = (P(None, axis), P(None, None, axis),
                            P(None, axis, None), P(axis, None), P())
    Vp = w_tok.shape[0]

    def body(tok_, h1s_, h2s_, g41_, g42_, g_, whh1_, wih2_,
             whh2_, h10_, wout_, bout_):
        out = _dec_bwd_ce_pallas(tok_, tok_, h1s_, h2s_, g41_, g42_, g_,
                                 whh1_, wih2_, whh2_,
                                 h10_, wout_, bout_, Vp, precision,
                                 head=ranges)
        (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
         dwout, dbout) = out
        return (jax.lax.psum(dwtok, axis), dprez,
                jax.lax.psum(dwhh1, axis), jax.lax.psum(dbhh1, axis),
                jax.lax.psum(dwih2, axis), jax.lax.psum(dbih2, axis),
                jax.lax.psum(dwhh2, axis), jax.lax.psum(dbhh2, axis), dh10,
                jax.lax.psum(dwout, axis), jax.lax.psum(dbout, axis))

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, b4, b4, b4, b4, mk3, rep, rep,
                                rep, bb, rep, rep),
                      out_specs=(rep, bb, rep, rep, rep, rep, rep, rep, bb,
                                 rep, rep),
                      check_vma=False)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10,
     dwout, dbout) = f(tok_t, h1_seq, h2_seq, g41, g42,
                       g_mk.astype(F32),
                       whh1, wih2, whh2, h1_0, w_out, b_out)
    return (_float0_like(tok_t),
            dwtok.astype(w_tok.dtype), dprez.astype(pre_z.dtype),
            dwhh1.astype(whh1.dtype), dbhh1.astype(bhh1.dtype),
            dwih2.astype(wih2.dtype), dbih2.astype(bih2.dtype),
            dwhh2.astype(whh2.dtype), dbhh2.astype(bhh2.dtype),
            dh10.astype(h1_0.dtype),
            (dwout.astype(w_out.dtype), dbout.astype(b_out.dtype)))


_dec_mask_core_dp.defvjp(_dec_mask_dp_vjp_fwd, _dec_mask_dp_vjp_bwd)


def _dec_w_split(p: dict, V: int):
    """(w_tok padded to ceil128(V), w_z) of the decoder cell's input
    projection. The fast param layout (models/fast.py) stores them
    pre-split/pre-padded; the canonical layout derives them here."""
    g = p["grucell_g"]
    if "w_tok_p" in g:
        return g["w_tok_p"], g["w_z"]
    w_ih = g["w_ih"]
    Vp = ((V + 127) // 128) * 128
    return jnp.pad(w_ih[:V], ((0, Vp - V), (0, 0))), w_ih[V:]


def decoder_teacher_fused_nll(p: dict, z, tokens, V: int, precision=None):
    """Teacher decode + CE in one kernel: returns per-position NLL (B, T)
    (= -log_softmax(logits)[target], nll_mean semantics before the mean —
    padding positions included, reference trainer.py:98-103). Valid when
    `kernel_dispatch(B)[0]` is 'single' (bare TPU) or 'dp' (pure-dp mesh:
    batch-sharded shard_map, weight grads psum'd)."""
    B, T = tokens.shape
    w_tok, w_z = _dec_w_split(p, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]
    Vp = w_tok.shape[0]
    h1_0 = z @ p["linear_init_global"]["w"] + p["linear_init_global"]["b"]
    start = jnp.full((B, 1), V - 1, jnp.int32)
    tgt = tokens.astype(jnp.int32)
    tok_t = jnp.swapaxes(
        jnp.concatenate([start, tgt[:, :-1]], axis=1), 0, 1)
    w_out = jnp.pad(p["linear_out_g"]["w"], ((0, 0), (0, Vp - V)))
    b_out = jnp.pad(p["linear_out_g"]["b"], (0, Vp - V),
                    constant_values=-1e30)
    args = (tok_t, jnp.swapaxes(tgt, 0, 1), w_tok,
            pre_z.astype(w_tok.dtype), p["grucell_g"]["w_hh"],
            p["grucell_g"]["b_hh"], p["grucell_g_2"]["w_ih"],
            p["grucell_g_2"]["b_ih"], p["grucell_g_2"]["w_hh"],
            p["grucell_g_2"]["b_hh"], h1_0.astype(w_tok.dtype),
            (w_out, b_out))
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    kind, mesh = kernel_dispatch(B)
    if kind == "dp":
        ce_tb = _dec_nll_core_dp(*args, mesh, mesh_lib.DATA_AXIS, precision)
    else:
        ce_tb = _dec_nll_core(*args, precision)
    return jnp.swapaxes(ce_tb, 0, 1)                          # (B, T)


def decoder_teacher_fused_masses(p: dict, z, tokens, V: int,
                                 ranges, precision=None, n_rep: int = 1):
    """Teacher decode + masked softmax masses in one kernel: returns a
    tuple of (B, T) arrays, one per static vocab range [lo, hi) in
    `ranges` — out_k[b, t] = sum_{v in range_k} softmax(logits[b, t])_v.
    This is all the GLSR regularizer needs from its four perturbation
    decodes (note-on and time-separator probability mass per step,
    reference trainer_glsr.py:123-139), so the (B, T, V) log-prob tensor
    never exists. Valid when `kernel_dispatch(B)[0]` is not None.

    n_rep > 1: `z` holds n_rep stacked batch copies that SHARE the teacher
    tokens (`tokens` has B/n_rep rows, z has B) — GLSR's four z
    perturbations over one sequence batch. The kernel embeds the tokens
    once per step and folds dW_tok over the copies (n_rep-fold smaller
    embedding matmuls)."""
    B = z.shape[0]
    B0, T = tokens.shape
    assert B0 * n_rep == B, (B0, n_rep, B)
    ranges = tuple(tuple(r) for r in ranges)
    w_tok, w_z = _dec_w_split(p, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]
    Vp = w_tok.shape[0]
    h1_0 = z @ p["linear_init_global"]["w"] + p["linear_init_global"]["b"]
    start = jnp.full((B0, 1), V - 1, jnp.int32)
    tok_t = jnp.swapaxes(
        jnp.concatenate([start, tokens[:, :-1].astype(jnp.int32)], axis=1),
        0, 1)                                                 # (T, B0)
    w_out = jnp.pad(p["linear_out_g"]["w"], ((0, 0), (0, Vp - V)))
    b_out = jnp.pad(p["linear_out_g"]["b"], (0, Vp - V),
                    constant_values=-1e30)
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    kind, mesh = kernel_dispatch(B)
    if kind == "dp" and n_rep > 1:
        # batch-sharding interleaves the copies across devices, so the
        # shared-token folding doesn't compose with dp — tile the tokens
        # back to the full batch instead (correctness identical)
        tok_t = jnp.tile(tok_t, (1, n_rep))
    args = (tok_t, w_tok, pre_z.astype(w_tok.dtype),
            p["grucell_g"]["w_hh"], p["grucell_g"]["b_hh"],
            p["grucell_g_2"]["w_ih"], p["grucell_g_2"]["b_ih"],
            p["grucell_g_2"]["w_hh"], p["grucell_g_2"]["b_hh"],
            h1_0.astype(w_tok.dtype), (w_out, b_out))
    if kind == "dp":
        mk = _dec_mask_core_dp(*args, ranges, mesh, mesh_lib.DATA_AXIS,
                               precision)
    else:
        mk = _dec_mask_core(*args, ranges, n_rep, precision)
    return tuple(jnp.swapaxes(mk[:, k, :], 0, 1)              # (B, T) each
                 for k in range(len(ranges)))


def _dec_dp_specs(axis):
    from jax.sharding import PartitionSpec as P
    return (P(None, None, axis),     # tok_t as (T, 1->B?) — see below
            P(None, axis, None),     # (T, B, H) streams
            P(axis, None),           # (B, G/H) per-batch
            P())                     # replicated weights


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def _dec_teacher_core_dp(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                         whh2, bhh2, h1_0, mesh, axis="data",
                         precision=None):
    """Fused teacher decoder over a pure-dp mesh: tokens/pre_z/h1_0 are
    batch-sharded, weights replicated, weight grads psum'd."""
    _, b4, bb, rep = _dec_dp_specs(axis)
    from jax.sharding import PartitionSpec as P
    tk = P(None, axis)

    def body(tok_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_, bhh2_,
             h10_):
        _, h2 = _dec_fwd_pallas(tok_, wtok_, prez_, whh1_, bhh1_, wih2_,
                                bih2_, whh2_, bhh2_, h10_, precision)
        return h2

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, rep, bb, rep, rep, rep, rep, rep, rep,
                                bb),
                      out_specs=b4, check_vma=False)
    return f(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0)


def _dec_dp_vjp_fwd(tok_t, w_tok, pre_z, whh1, bhh1, wih2, bih2,
                    whh2, bhh2, h1_0, mesh, axis, precision):
    _, b4, bb, rep = _dec_dp_specs(axis)
    from jax.sharding import PartitionSpec as P
    tk = P(None, axis)

    def body(tok_, wtok_, prez_, whh1_, bhh1_, wih2_, bih2_, whh2_, bhh2_,
             h10_):
        return _dec_fwd_pallas(tok_, wtok_, prez_, whh1_, bhh1_, wih2_,
                               bih2_, whh2_, bhh2_, h10_, precision,
                               stash_gates=True)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, rep, bb, rep, rep, rep, rep, rep, rep,
                                bb),
                      out_specs=(b4, b4, b4, b4), check_vma=False)
    h1_seq, h2_seq, g41, g42 = f(tok_t, w_tok, pre_z, whh1, bhh1, wih2,
                                 bih2, whh2, bhh2, h1_0)
    return h2_seq, (tok_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z,
                    whh1, bhh1, wih2, bih2, whh2, bhh2, h1_0)


def _dec_dp_vjp_bwd(mesh, axis, precision, res, g2):
    (tok_t, h1_seq, h2_seq, g41, g42, w_tok, pre_z, whh1, bhh1,
     wih2, bih2, whh2, bhh2, h1_0) = res
    _, b4, bb, rep = _dec_dp_specs(axis)
    from jax.sharding import PartitionSpec as P
    tk = P(None, axis)
    Vp = w_tok.shape[0]

    def body(tok_, h1s_, h2s_, g41_, g42_, g2_, whh1_, wih2_, whh2_, h10_):
        out = _dec_bwd_pallas(tok_, h1s_, h2s_, g41_, g42_, g2_,
                              whh1_, wih2_, whh2_, h10_, Vp, precision)
        (dwtok, dprez, dwhh1, dbhh1, dwih2, dbih2, dwhh2, dbhh2, dh10) = out
        return (jax.lax.psum(dwtok, axis), dprez,
                jax.lax.psum(dwhh1, axis), jax.lax.psum(dbhh1, axis),
                jax.lax.psum(dwih2, axis), jax.lax.psum(dbih2, axis),
                jax.lax.psum(dwhh2, axis), jax.lax.psum(dbhh2, axis), dh10)

    f = jax.shard_map(body, mesh=mesh,
                      in_specs=(tk, b4, b4, b4, b4, b4, rep, rep, rep, bb),
                      out_specs=(rep, bb, rep, rep, rep, rep, rep, rep, bb),
                      check_vma=False)
    (dwtok, dprez, dwhh1, dbhh1, dwih2, dbib2, dwhh2, dbhh2, dh10) = f(
        tok_t, h1_seq, h2_seq, g41, g42, g2.astype(h2_seq.dtype),
        whh1, wih2, whh2, h1_0)
    return (_float0_like(tok_t), dwtok.astype(w_tok.dtype),
            dprez.astype(pre_z.dtype), dwhh1.astype(whh1.dtype),
            dbhh1.astype(bhh1.dtype), dwih2.astype(wih2.dtype),
            dbib2.astype(bih2.dtype), dwhh2.astype(whh2.dtype),
            dbhh2.astype(bhh2.dtype), dh10.astype(h1_0.dtype))


_dec_teacher_core_dp.defvjp(_dec_dp_vjp_fwd, _dec_dp_vjp_bwd)


def decoder_teacher_fused(p: dict, z, tokens, V: int, precision=None):
    """Public fused teacher decode: p is the `_global_view` param dict,
    tokens (B, T) the target ids (teacher inputs are [start; tokens[:-1]],
    start = one-hot at the LAST vocab index, reference model_v2.py:119-120).
    Returns h2_seq as (B, T, H); the logits head stays outside (one large
    MXU matmul over T*B rows)."""
    B, T = tokens.shape
    w_tok, w_z = _dec_w_split(p, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]
    Vp = w_tok.shape[0]
    h1_0 = z @ p["linear_init_global"]["w"] + p["linear_init_global"]["b"]
    start = jnp.full((B, 1), V - 1, jnp.int32)
    tok_t = jnp.swapaxes(
        jnp.concatenate([start, tokens[:, :-1].astype(jnp.int32)], axis=1),
        0, 1)                                                   # (T, B)
    args = (tok_t, w_tok, pre_z.astype(w_tok.dtype), p["grucell_g"]["w_hh"],
            p["grucell_g"]["b_hh"], p["grucell_g_2"]["w_ih"],
            p["grucell_g_2"]["b_ih"], p["grucell_g_2"]["w_hh"],
            p["grucell_g_2"]["b_hh"], h1_0.astype(w_tok.dtype))
    from music_fader_nets_tpu.parallel import mesh as mesh_lib
    kind, mesh = kernel_dispatch(B)
    if kind == "dp":
        h2_seq = _dec_teacher_core_dp(*args, mesh, mesh_lib.DATA_AXIS,
                                      precision)
    else:
        h2_seq = _dec_teacher_core(*args, precision)
    return jnp.swapaxes(h2_seq, 0, 1)                           # (B, T, H)


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
