"""Shared building blocks of all Music FaderNets model families.

Three components compose every model in the reference
(reference model_v2.py:81-143, gmm_model.py:82-149):

  * a bidirectional-GRU sequence encoder producing a diagonal Gaussian,
  * teacher-forced GRU *sub-decoders* reconstructing attribute tracks,
  * an autoregressive 2-layer-GRUCell *global decoder* over event tokens.

TPU-first design notes:
  * All recurrences are `lax.scan`s with the input-to-hidden projection of
    the whole sequence hoisted into a single MXU matmul (see ops/gru.py).
  * The autoregressive decoder's per-step input is `[one_hot(token), z]`
    (reference model_v2.py:128). The `z` half is constant across steps, so
    its projection is computed once; the one-hot half's projection is a row
    *gather* of `w_ih` — no per-step input matmul exists at all. The scan
    body is two (B,H)@(H,3H) matmuls + the (B,H)@(H,V) logit projection.
  * Shapes are static (`steps` is a Python int) so XLA compiles one program
    per decode length (100 for eval, 300 for transfer).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.ops.gru import (
    bigru_apply,
    bigru_init,
    gru_cell_from_pre,
    gru_init,
    gru_scan,
    linear_apply,
    linear_init,
    multi_gru_final_states,
    multi_gru_final_states_packed,
    stacked_gru_scan,
)

# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_stream_init(key, in_dim: int, hidden: int, z_dims: int, dtype=jnp.float32):
    """One encoder stream: bi-GRU + mu/logsig heads."""
    kg, km, kv = jax.random.split(key, 3)
    return {
        "gru": bigru_init(kg, in_dim, hidden, dtype),
        "mu": linear_init(km, 2 * hidden, z_dims, dtype),
        "var": linear_init(kv, 2 * hidden, z_dims, dtype),
    }


def encoder_stream_apply(p, x_oh: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x_oh (B, T, V) -> (mu, stddev). stddev = exp(logsig): the reference's
    `var` head predicts log-sigma and exponentiates (model_v2.py:85)."""
    h = bigru_apply(p["gru"], x_oh)          # (B, 2H)
    mu = linear_apply(p["mu"], h)
    std = jnp.exp(linear_apply(p["var"], h))
    return mu, std


def encode_streams_fused_packed(enc: dict, heads: list, x_oh: jax.Array,
                                use_pallas: bool = False, tokens=None):
    """`encode_streams_fused` over a pre-stacked fast-layout encoder group
    (models/fast.py `enc_rn`/`enc_1`/`enc_e`: directions [s0.fwd, s0.bwd,
    s1.fwd, ...], w_ih pre-padded to the kernel's lane-aligned vocab).
    heads: [(mu_params, var_params)] per stream. Numerics identical to the
    canonical path — the stack/pad that otherwise runs every step was done
    once at the jit boundary."""
    reverse = [False, True] * len(heads)
    finals = multi_gru_final_states_packed(
        enc["w_ih_p"], enc["b_ih"], enc["w_hh"], enc["b_hh"], x_oh, reverse,
        use_pallas=use_pallas, tokens=tokens)                # (2S, B, H)
    out = []
    for i, (mu_p, var_p) in enumerate(heads):
        h = jnp.concatenate([finals[2 * i], finals[2 * i + 1]], axis=-1)
        out.append((linear_apply(mu_p, h),
                    jnp.exp(linear_apply(var_p, h))))
    return out


def encode_streams_fused(views: list, x_oh: jax.Array,
                         use_pallas: bool = False, tokens=None):
    """All encoder streams' bi-GRU directions in ONE fused scan.

    Separate `lax.scan`s run sequentially under XLA, so S bidirectional
    encoders over the same input would cost 2*S*T sequential matmuls; fusing
    them costs T sequential steps of one batched (2S,B,H)@(2S,H,3H)
    contraction. Returns a list of (mu, stddev) per stream — identical
    numerics to `encoder_stream_apply` per stream.

    tokens: (B, T) int ids when x_oh is exactly one_hot(tokens) — routes to
    the embedded-token pallas kernel on TPU (see multi_gru_final_states).
    """
    params, reverse = [], []
    for v in views:
        params += [v["gru"]["fwd"], v["gru"]["bwd"]]
        reverse += [False, True]
    finals = multi_gru_final_states(params, x_oh, reverse,
                                    use_pallas=use_pallas,
                                    tokens=tokens)           # (2S, B, H)
    out = []
    for i, v in enumerate(views):
        h = jnp.concatenate([finals[2 * i], finals[2 * i + 1]], axis=-1)
        out.append((linear_apply(v["mu"], h),
                    jnp.exp(linear_apply(v["var"], h))))
    return out


# ---------------------------------------------------------------------------
# Sub-decoder (teacher-forced attribute-track reconstruction)
# ---------------------------------------------------------------------------


def sub_decoder_init(key, z_dims: int, track_dims: int, hidden: int, dtype=jnp.float32):
    kg, ki, ko = jax.random.split(key, 3)
    return {
        "gru": gru_init(kg, z_dims + track_dims, hidden, dtype),
        "init": linear_init(ki, z_dims, hidden, dtype),
        "out": linear_init(ko, hidden, track_dims, dtype),
    }


def sub_decoder_apply(p, track_oh: jax.Array, z: jax.Array,
                      faithful_softmax_axis: bool = True) -> jax.Array:
    """Teacher-forced track reconstruction (reference model_v2.py:99-116).

    Input at each step is `[track_onehot_t, z]`; hidden state initialized
    from `linear_init(z)`. When `faithful_softmax_axis`, log_softmax is taken
    over axis=1 (the TIME axis) replicating the reference's
    `F.log_softmax(..., 1)` on a (B, T, C) tensor — a documented quirk
    (SURVEY.md §2.4); otherwise over the class axis.
    """
    B, T, _ = track_oh.shape
    z_rep = jnp.broadcast_to(z[:, None, :], (B, T, z.shape[-1]))
    inputs = jnp.concatenate([track_oh, z_rep], axis=-1)
    h0 = linear_apply(p["init"], z)
    outs, _ = gru_scan(p["gru"], inputs, h0)
    logits = linear_apply(p["out"], outs)    # (B, T, C)
    axis = 1 if faithful_softmax_axis else -1
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=axis)


def sub_decoder_pair_apply(p_r, p_n, r_oh, n_oh, z_r, z_n,
                           faithful_softmax_axis: bool = True,
                           use_pallas: bool = False):
    """Both attribute sub-decoders in one fused scan (their recurrences are
    independent and same-length; only the hoisted input projections and
    output heads differ). Numerics identical to two `sub_decoder_apply`s."""
    B, T, _ = r_oh.shape

    def pre_of(p, track_oh, z):
        z_rep = jnp.broadcast_to(z[:, None, :], (B, T, z.shape[-1]))
        inputs = jnp.concatenate([track_oh, z_rep], axis=-1)
        pre = inputs @ p["gru"]["w_ih"] + p["gru"]["b_ih"]   # (B, T, 3H)
        return jnp.swapaxes(pre, 0, 1)                        # (T, B, 3H)

    pre = jnp.stack([pre_of(p_r, r_oh, z_r), pre_of(p_n, n_oh, z_n)])
    w_hh = jnp.stack([p_r["gru"]["w_hh"], p_n["gru"]["w_hh"]])
    b_hh = jnp.stack([p_r["gru"]["b_hh"], p_n["gru"]["b_hh"]])
    h0 = jnp.stack([linear_apply(p_r["init"], z_r),
                    linear_apply(p_n["init"], z_n)])
    outs, _ = stacked_gru_scan(pre, w_hh, b_hh, h0,
                               use_pallas=use_pallas)         # (2, T, B, H)
    axis = 1 if faithful_softmax_axis else -1
    r_logits = linear_apply(p_r["out"], jnp.swapaxes(outs[0], 0, 1))
    n_logits = linear_apply(p_n["out"], jnp.swapaxes(outs[1], 0, 1))
    return (jax.nn.log_softmax(r_logits.astype(jnp.float32), axis=axis),
            jax.nn.log_softmax(n_logits.astype(jnp.float32), axis=axis))


def sub_decoder_pair_apply_packed(sub: dict, init_r, init_n, out_r, out_n,
                                  r_oh, n_oh, z_r, z_n,
                                  faithful_softmax_axis: bool = True,
                                  use_pallas: bool = False,
                                  track_ids=None):
    """`sub_decoder_pair_apply` over the fast-layout `sub_rn` group
    (models/fast.py): both streams' w_ih share one stacked (2, Dm+Z, 3H)
    tensor with input rows [track padded to Dm, z], so the whole hoisted
    input projection is ONE batched einsum producing the time-major
    (2, T, B, 3H) `pre` directly — no per-step stack of the two (B, T, 3H)
    projections (that stack wrote ~25 MB/step at reference dims).

    track_ids: optional ((B,T) rhythm ids, (B,T) note ids) with
    r_oh/n_oh = one_hot(ids) — routes to the class-embedded kernel
    (ops/pallas_gru.stacked_gru_embed_seq), which embeds the track class
    on-core and adds the per-sequence z projection: neither the (2,T,B,3H)
    `pre` tensor nor its dpre twin ever exists in HBM."""
    B, T, _ = r_oh.shape
    Z = z_r.shape[-1]
    dm = sub["w_ih"].shape[1] - Z

    Cp = 128  # lane-aligned class-embedding pad (kernel path needs dm <= Cp)
    if use_pallas and track_ids is not None and dm <= Cp:
        from music_fader_nets_tpu.ops import pallas_gru
        from music_fader_nets_tpu.parallel import mesh as mesh_lib
        kind, mesh = pallas_gru.kernel_dispatch(B)
        if kind is not None:
            dt = r_oh.dtype
            w_emb = jnp.pad(sub["w_ih"][:, :dm],
                            ((0, 0), (0, Cp - dm), (0, 0)))
            w_z = sub["w_ih"][:, dm:]                # (2, Z, 3H)
            z_l = jnp.stack([z_r, z_n]).astype(dt)   # (2, B, Z)
            prez = (jnp.einsum("lbz,lzg->lbg", z_l, w_z)
                    + sub["b_ih"][:, None, :]).astype(dt)
            cls_lt = jnp.stack(
                [jnp.swapaxes(ids.astype(jnp.int32), 0, 1)
                 for ids in track_ids])              # (2, T, B)
            h0 = jnp.stack([linear_apply(init_r, z_r),
                            linear_apply(init_n, z_n)]).astype(dt)
            if kind == "single":
                outs = pallas_gru.stacked_gru_embed_seq(
                    cls_lt, w_emb.astype(dt), prez, sub["w_hh"].astype(dt),
                    sub["b_hh"].astype(dt), h0)
            else:
                outs = pallas_gru.stacked_gru_embed_seq_dp(
                    cls_lt, w_emb.astype(dt), prez, sub["w_hh"].astype(dt),
                    sub["b_hh"].astype(dt), h0, mesh, mesh_lib.DATA_AXIS)
            axis = 1 if faithful_softmax_axis else -1
            r_logits = linear_apply(out_r, jnp.swapaxes(outs[0], 0, 1))
            n_logits = linear_apply(out_n, jnp.swapaxes(outs[1], 0, 1))
            return (jax.nn.log_softmax(r_logits.astype(jnp.float32),
                                       axis=axis),
                    jax.nn.log_softmax(n_logits.astype(jnp.float32),
                                       axis=axis))

    def inp(track_oh, z):
        pad = dm - track_oh.shape[-1]
        if pad:
            track_oh = jnp.concatenate(
                [track_oh, jnp.zeros((B, T, pad), track_oh.dtype)], axis=-1)
        z_rep = jnp.broadcast_to(z[:, None, :], (B, T, Z))
        return jnp.concatenate([track_oh, z_rep.astype(track_oh.dtype)],
                               axis=-1)

    x = jnp.stack([inp(r_oh, z_r), inp(n_oh, z_n)])          # (2, B, T, Dm+Z)
    pre = (jnp.einsum("lbti,lig->ltbg", x, sub["w_ih"])
           + sub["b_ih"][:, None, None, :])
    h0 = jnp.stack([linear_apply(init_r, z_r), linear_apply(init_n, z_n)])
    outs, _ = stacked_gru_scan(pre, sub["w_hh"], sub["b_hh"], h0,
                               use_pallas=use_pallas)        # (2, T, B, H)
    axis = 1 if faithful_softmax_axis else -1
    r_logits = linear_apply(out_r, jnp.swapaxes(outs[0], 0, 1))
    n_logits = linear_apply(out_n, jnp.swapaxes(outs[1], 0, 1))
    return (jax.nn.log_softmax(r_logits.astype(jnp.float32), axis=axis),
            jax.nn.log_softmax(n_logits.astype(jnp.float32), axis=axis))


# ---------------------------------------------------------------------------
# Global autoregressive decoder
# ---------------------------------------------------------------------------


def global_decoder_init(key, z_total: int, roll_dims: int, hidden: int, dtype=jnp.float32):
    """2-layer GRUCell decoder (reference model_v2.py:44-49). Per-step input is
    `[token_onehot (roll_dims), z (z_total)]` — token first, matching
    `torch.cat([out, z], 1)` (model_v2.py:128) for converter parity."""
    ki, k1, k2, ko = jax.random.split(key, 4)
    return {
        "linear_init_global": linear_init(ki, z_total, hidden, dtype),
        "grucell_g": gru_init(k1, roll_dims + z_total, hidden, dtype),
        "grucell_g_2": gru_init(k2, hidden, hidden, dtype),
        "linear_out_g": linear_init(ko, hidden, roll_dims, dtype),
    }


def _split_w_ih(p, roll_dims: int):
    g = p["grucell_g"]
    if "w_tok_p" in g:                       # fast layout: pre-split at the
        return g["w_tok_p"][:roll_dims], g["w_z"]  # vocab boundary
    w_ih = g["w_ih"]                         # (V + Z, 3H)
    return w_ih[:roll_dims], w_ih[roll_dims:]


def _decoder_step(p, pre_x, h1, h2, is_first):
    """One decoder step given a precomputed layer-1 input projection.

    Replicates the reference's step-0 special case (model_v2.py:130-132):
    after the layer-1 update at step 0, layer 2's previous hidden is set to
    the *new* layer-1 state before its own update.
    """
    h1_new = gru_cell_from_pre(p["grucell_g"], pre_x, h1)
    h2_prev = jnp.where(is_first, h1_new, h2)
    pre2 = h1_new @ p["grucell_g_2"]["w_ih"] + p["grucell_g_2"]["b_ih"]
    h2_new = gru_cell_from_pre(p["grucell_g_2"], pre2, h2_prev)
    logp = jax.nn.log_softmax(
        linear_apply(p["linear_out_g"], h2_new).astype(jnp.float32), axis=-1)
    return h1_new, h2_new, logp


def global_decoder_teacher(p, z: jax.Array, x_oh: jax.Array,
                           use_pallas: bool = False,
                           tokens: jax.Array = None) -> jax.Array:
    """Teacher-forced decode over the full sequence (training path).

    Inputs are `[start, x_0, ..., x_{T-2}]`; outputs predict `[x_0..x_{T-1}]`
    (reference model_v2.py:127-142 with `eps=100` => always teacher-forced,
    SURVEY.md §2.4). The start token is one-hot at the LAST vocab index
    (model_v2.py:119-120 `out[:, -1] = 1`).

    TPU structure: because teacher forcing makes layer 1's inputs known in
    advance, the two GRU layers decouple into two CONSECUTIVE scans instead
    of one scan with three chained matmuls per step:
      1. hoist the whole input projection (token AND z parts) into one MXU
         matmul, scan layer 1 (one (B,H)@(H,3H) per step),
      2. hoist layer 2's input projection of the full h1 sequence into one
         (T*B,H)@(H,3H) matmul, scan layer 2,
      3. one (T*B,H)@(H,V) matmul for all logits + log_softmax.
    The reference's i==0 special case (layer 2's initial hidden = layer 1's
    first new state, model_v2.py:130-132) becomes h2_0 = h1_seq[0].
    """
    B, T, V = x_oh.shape

    if use_pallas and tokens is not None:
        from music_fader_nets_tpu.ops import pallas_gru
        if pallas_gru.kernel_dispatch(B)[0] is not None:
            # fused 2-layer kernel: both GRU layers advance in one T-loop,
            # teacher tokens embedded on-core (ops/pallas_gru.py)
            h2_bt = pallas_gru.decoder_teacher_fused(p, z, tokens, V)
            logits = linear_apply(p["linear_out_g"], h2_bt)
            return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    w_tok, w_z = _split_w_ih(p, V)
    start = jnp.zeros((B, 1, V), x_oh.dtype).at[:, 0, V - 1].set(1.0)
    inputs = jnp.concatenate([start, x_oh[:, :-1]], axis=1)          # (B, T, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]                          # (B, 3H)
    pre = inputs @ w_tok + pre_z[:, None, :]                          # (B, T, 3H)
    pre = jnp.swapaxes(pre, 0, 1)                                     # (T, B, 3H)

    h1_0 = linear_apply(p["linear_init_global"], z)
    cell1, cell2 = p["grucell_g"], p["grucell_g_2"]

    if use_pallas and jax.default_backend() == "tpu":
        # `pre` is already time-major (T, B, 3H); the stacked kernel takes
        # (L, T, B, 3H) with L=1 here
        outs, _ = stacked_gru_scan(
            pre[None], cell1["w_hh"][None],
            cell1["b_hh"][None], h1_0[None], use_pallas=True)
        h1_seq = outs[0]                                              # (T, B, H)
        pre2 = h1_seq @ cell2["w_ih"] + cell2["b_ih"]                 # (T, B, 3H)
        outs2, _ = stacked_gru_scan(
            pre2[None], cell2["w_hh"][None],
            cell2["b_hh"][None], h1_seq[0][None], use_pallas=True)
        h2_seq = outs2[0]
    else:
        def body1(h, pre_t):
            h = gru_cell_from_pre(cell1, pre_t, h)
            return h, h

        _, h1_seq = jax.lax.scan(body1, h1_0, pre)                    # (T, B, H)

        pre2 = h1_seq @ cell2["w_ih"] + cell2["b_ih"]                 # (T, B, 3H)

        def body2(h, pre_t):
            h = gru_cell_from_pre(cell2, pre_t, h)
            return h, h

        _, h2_seq = jax.lax.scan(body2, h1_seq[0], pre2)              # (T, B, H)

    logits = linear_apply(p["linear_out_g"], jnp.swapaxes(h2_seq, 0, 1))
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)    # (B, T, V)


def global_decoder_teacher_nll(p, z: jax.Array, x_oh: jax.Array,
                               tokens: jax.Array, targets: jax.Array,
                               use_pallas: bool = False) -> jax.Array:
    """Per-position NLL of the teacher-forced decode: (B, T) array of
    -log_softmax(logits)[target] — `losses.elbo.nll_mean` before the mean,
    padding included (reference trainer.py:98-103).

    On the single-device TPU path this runs as ONE kernel (decode + logits
    head + log-softmax + target gather fused, ops/pallas_gru.py); the
    (B,T,V) log-prob tensor never exists. Elsewhere it falls back to the
    regular teacher decode + gather (identical numerics)."""
    if use_pallas and tokens is not None:
        from music_fader_nets_tpu.ops import pallas_gru
        B, T, V = x_oh.shape
        # CE-fused kernel applies on bare TPU AND pure-dp meshes (batch
        # sharded via shard_map, ops/pallas_gru.py:_dec_nll_core_dp); tp
        # meshes use the fused decoder + gather fallback below
        if pallas_gru.kernel_dispatch(B)[0] is not None:
            return pallas_gru.decoder_teacher_fused_nll(p, z, tokens, V)
    logp = global_decoder_teacher(p, z, x_oh, use_pallas=use_pallas,
                                  tokens=tokens)
    picked = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return -picked


def global_decoder_teacher_masses(p, z: jax.Array, x_oh: jax.Array,
                                  tokens: jax.Array, ranges,
                                  use_pallas: bool = False,
                                  n_rep: int = 1):
    """Per-step masked softmax masses of the teacher-forced decode: a tuple
    of (B, T) arrays, out_k[b, t] = sum over vocab range_k [lo, hi) of
    softmax(logits[b, t]) — exactly what the GLSR regularizer consumes from
    its perturbation decodes (reference trainer_glsr.py:123-139).

    On the TPU kernel path (bare chip or pure-dp mesh) this runs as ONE
    fused kernel and the (B,T,V) log-prob tensor never exists; elsewhere it
    falls back to the teacher decode + masked softmax sums (identical
    numerics: softmax(log_softmax(x)) == softmax(x)).

    n_rep > 1 declares that `z` stacks n_rep batch copies sharing the SAME
    teacher inputs (`x_oh`/`tokens` then have z.shape[0]/n_rep rows) — the
    kernel embeds the shared tokens once per step; the fallback just tiles
    them."""
    B0, T, V = x_oh.shape
    if use_pallas and tokens is not None:
        from music_fader_nets_tpu.ops import pallas_gru
        if pallas_gru.kernel_dispatch(z.shape[0])[0] is not None:
            return pallas_gru.decoder_teacher_fused_masses(
                p, z, tokens, V, ranges, n_rep=n_rep)
    if n_rep > 1:
        x_oh = jnp.tile(x_oh, (n_rep, 1, 1))
        tokens = None if tokens is None else jnp.tile(tokens, (n_rep, 1))
    logp = global_decoder_teacher(p, z, x_oh, use_pallas=use_pallas,
                                  tokens=tokens)
    probs = jax.nn.softmax(logp, axis=-1)
    return tuple(jnp.sum(probs[..., lo:hi], axis=-1) for lo, hi in ranges)


def global_decoder_scheduled(p, z: jax.Array, x_oh: jax.Array, rng,
                             eps: float) -> jax.Array:
    """Scheduled-sampling decode: at each step one Bernoulli coin for the
    whole batch picks teacher forcing (prob `eps`) vs the model's own argmax
    feedback — the reference's latent machinery (model_v2.py:135-140, with
    its decay schedule commented out at :258-259; `eps=100` makes the
    shipped model always-teacher-forced). `eps>=1` reproduces
    `global_decoder_teacher` exactly; `eps<=0` reproduces greedy feedback.
    """
    B, T, V = x_oh.shape
    w_tok, w_z = _split_w_ih(p, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]
    start = jnp.zeros((B, 1, V), x_oh.dtype).at[:, 0, V - 1].set(1.0)
    teacher = jnp.concatenate([start, x_oh[:, :-1]], axis=1)
    teacher_pre = jnp.swapaxes(teacher @ w_tok + pre_z[:, None, :], 0, 1)

    h1 = linear_apply(p["linear_init_global"], z)
    h2 = jnp.zeros_like(h1)
    tok0 = jnp.full((B,), V - 1, dtype=jnp.int32)
    coins = jax.random.uniform(rng, (T,)) < eps    # per-step, whole batch

    def body(carry, inp):
        h1, h2, tok = carry
        t, tpre_t, coin = inp
        own_pre = jnp.take(w_tok, tok, axis=0) + pre_z
        pre_t = jnp.where(coin, tpre_t, own_pre)
        h1, h2, logp = _decoder_step(p, pre_t, h1, h2, t == 0)
        tok_new = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        return (h1, h2, tok_new), logp

    _, logps = jax.lax.scan(body, (h1, h2, tok0),
                            (jnp.arange(T), teacher_pre, coins))
    return jnp.swapaxes(logps, 0, 1)


def global_decoder_greedy(p, z: jax.Array, steps: int) -> jax.Array:
    """Autoregressive greedy decode (eval / style-transfer path).

    Token feedback is the argmax of the previous step's log-probs
    (reference model_v2.py:140-142 `_sampling`). Because the feedback is
    one-hot, its input projection is a row gather `w_tok[token_id]` — the
    scan body contains no input matmul.
    """
    B = z.shape[0]
    V = p["linear_out_g"]["w"].shape[-1]
    w_tok, w_z = _split_w_ih(p, V)
    pre_z = z @ w_z + p["grucell_g"]["b_ih"]                          # (B, 3H)

    h1 = linear_apply(p["linear_init_global"], z)
    h2 = jnp.zeros_like(h1)
    tok0 = jnp.full((B,), V - 1, dtype=jnp.int32)                     # start = last idx

    def body(carry, t):
        h1, h2, tok = carry
        pre_t = jnp.take(w_tok, tok, axis=0) + pre_z                  # gather, no matmul
        h1, h2, logp = _decoder_step(p, pre_t, h1, h2, t == 0)
        tok_new = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        return (h1, h2, tok_new), logp

    _, logps = jax.lax.scan(body, (h1, h2, tok0), jnp.arange(steps))
    return jnp.swapaxes(logps, 0, 1)                                  # (B, steps, V)
