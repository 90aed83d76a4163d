"""The four Gaussian-prior model families of Music FaderNets.

Parameter pytrees use the reference's attribute names verbatim
(reference model_v2.py:26-60) so released `.pt` checkpoints convert
weight-for-weight (see utils/checkpoint.py). Layers the reference defines but
never exercises (`gru_c`, `gru_d_c`, `c_r`, `c_n`, `mu_c/var_c`,
`linear_init_c`, `linear_out_c` — SURVEY.md §2.3) are created for
state-dict parity but excluded from the forward computation, exactly like
the reference.

All forward passes are pure functions of (params, rng, batch) and jit/pjit
cleanly; nothing here holds state.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from music_fader_nets_tpu.config import ModelConfig
from music_fader_nets_tpu.models.modules import (
    encode_streams_fused,
    encode_streams_fused_packed,
    global_decoder_greedy,
    global_decoder_init,
    global_decoder_teacher,
    global_decoder_teacher_nll,
    sub_decoder_apply,
    sub_decoder_pair_apply,
    sub_decoder_pair_apply_packed,
)
from music_fader_nets_tpu.ops.gru import (
    bigru_init,
    gru_init,
    linear_apply,
    linear_init,
)
from music_fader_nets_tpu.ops.sampling import grad_reverse, reparameterize

Params = Dict


def _enc_view(params, suffix: str):
    """Assemble an encoder-stream param view from flat reference-named leaves."""
    return {
        "gru": params[f"gru_{suffix}"],
        "mu": params[f"mu_{suffix}"],
        "var": params[f"var_{suffix}"],
    }


def _sub_view(params, suffix: str):
    return {
        "gru": params[f"gru_d_{suffix}"],
        "init": params[f"linear_init_{suffix}"],
        "out": params[f"linear_out_{suffix}"],
    }


def _sub_pair_apply(params, r_oh, n_oh, z_r, z_n, faithful_axis, use_pallas,
                    track_ids=None):
    """Both attribute sub-decoders, dispatching on the param layout
    (canonical vs fast — models/fast.py). track_ids: optional
    ((B,T) rhythm ids, (B,T) note ids) enabling the class-embedded kernel
    on the fast layout."""
    if "sub_rn" in params:
        return sub_decoder_pair_apply_packed(
            params["sub_rn"],
            params["linear_init_r"], params["linear_init_n"],
            params["linear_out_r"], params["linear_out_n"],
            r_oh, n_oh, z_r, z_n, faithful_axis, use_pallas=use_pallas,
            track_ids=track_ids)
    return sub_decoder_pair_apply(
        _sub_view(params, "r"), _sub_view(params, "n"), r_oh, n_oh, z_r, z_n,
        faithful_axis, use_pallas=use_pallas)


def _global_view(params):
    return {
        "linear_init_global": params["linear_init_global"],
        "grucell_g": params["grucell_g"],
        "grucell_g_2": params["grucell_g_2"],
        "linear_out_g": params["linear_out_g"],
    }


# ===========================================================================
# MusicAttrRegVAE — disentangled rhythm/note encoders, vanilla Gaussian prior
# (reference model_v2.py:9-171)
# ===========================================================================


def init_reg_vae(key, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    ks = iter(jax.random.split(key, 24))
    p = {}
    # disentangled bi-GRU encoders (chroma encoder built but unused in forward,
    # reference model_v2.py:28,81-97)
    for s in ("r", "n", "c"):
        p[f"gru_{s}"] = bigru_init(next(ks), V, H, dtype)
        p[f"mu_{s}"] = linear_init(next(ks), 2 * H, Z, dtype)
        p[f"var_{s}"] = linear_init(next(ks), 2 * H, Z, dtype)
    # teacher-forced sub-decoders
    p["gru_d_r"] = gru_init(next(ks), Z + cfg.rhythm_dims, H, dtype)
    p["gru_d_n"] = gru_init(next(ks), Z + cfg.note_dims, H, dtype)
    p["gru_d_c"] = gru_init(next(ks), Z + cfg.chroma_dims, H, dtype)  # unused
    p["linear_init_r"] = linear_init(next(ks), Z, H, dtype)
    p["linear_init_n"] = linear_init(next(ks), Z, H, dtype)
    p["linear_init_c"] = linear_init(next(ks), Z, H, dtype)           # unused
    p["linear_out_r"] = linear_init(next(ks), H, cfg.rhythm_dims, dtype)
    p["linear_out_n"] = linear_init(next(ks), H, cfg.note_dims, dtype)
    p["linear_out_c"] = linear_init(next(ks), Z, cfg.chroma_dims, dtype)  # unused
    # unused classifier heads (reference model_v2.py:36-37)
    p["c_r"] = linear_init(next(ks), Z, 3, dtype)
    p["c_n"] = linear_init(next(ks), Z, 3, dtype)
    # global decoder: z_global = [z_r, z_n, chroma] (reference model_v2.py:164)
    z_total = 2 * Z + cfg.chroma_dims
    p.update(global_decoder_init(next(ks), z_total, V, H, dtype))
    return p


def reg_vae_encode(params, x_oh, use_pallas: bool = False, tokens=None
                   ) -> Tuple[Tuple[jax.Array, jax.Array],
                              Tuple[jax.Array, jax.Array]]:
    """Returns ((mu_r, std_r), (mu_n, std_n)). reference model_v2.py:81-97.
    Both streams' bi-GRU directions run in one fused scan (the embedded-
    token pallas kernel when `tokens` is given and x_oh = one_hot(tokens)).
    Accepts the canonical pytree or the fast layout (models/fast.py)."""
    if "enc_rn" in params:
        (mu_r, std_r), (mu_n, std_n) = encode_streams_fused_packed(
            params["enc_rn"],
            [(params["mu_r"], params["var_r"]),
             (params["mu_n"], params["var_n"])], x_oh,
            use_pallas=use_pallas, tokens=tokens)
        return (mu_r, std_r), (mu_n, std_n)
    (mu_r, std_r), (mu_n, std_n) = encode_streams_fused(
        [_enc_view(params, "r"), _enc_view(params, "n")], x_oh,
        use_pallas=use_pallas, tokens=tokens)
    return (mu_r, std_r), (mu_n, std_n)


def reg_vae_global_decode(params, z, steps: int):
    """Greedy autoregressive decode; z = [z_r, z_n, chroma]."""
    return global_decoder_greedy(_global_view(params), z, steps)


def reg_vae_decode_tokens(params, z, steps: int, use_pallas: bool = True):
    """Token-level greedy decode via the VMEM-resident Pallas kernel
    (ops/pallas_decode.py), falling back to the XLA scan."""
    from music_fader_nets_tpu.ops.pallas_decode import greedy_decode_tokens
    return greedy_decode_tokens(_global_view(params), z, steps, use_pallas)


def reg_vae_forward(params, rng, x_oh, r_oh, n_oh, chroma,
                    cfg: ModelConfig, train: bool = True,
                    tokens=None, nll_targets=None, track_ids=None) -> Dict:
    """Full training-path forward (reference model_v2.py:145-171).

    Teacher-forced when `train` (the reference's `eps=100` makes scheduled
    sampling a no-op — always teacher-forced, SURVEY.md §2.4); greedy
    otherwise. Returns log-prob outputs, distributions and latents.
    `tokens`: optional (B, T) ids with x_oh = one_hot(tokens), for the
    embedded-token encoder kernel. `track_ids`: optional (rhythm, note) id
    pair with r_oh/n_oh = one_hot(ids), for the class-embedded sub-decoder
    kernel (fast layout only).
    """
    pal = cfg.use_pallas_gru
    (mu_r, std_r), (mu_n, std_n) = reg_vae_encode(params, x_oh,
                                                  use_pallas=pal,
                                                  tokens=tokens)
    rng_r, rng_n = jax.random.split(rng)
    z_r = reparameterize(rng_r, mu_r, std_r)
    z_n = reparameterize(rng_n, mu_n, std_n)

    r_out, n_out = _sub_pair_apply(
        params, r_oh, n_oh, z_r, z_n,
        cfg.faithful_subdecoder_softmax_axis, use_pallas=pal,
        track_ids=track_ids)

    z = jnp.concatenate([z_r, z_n, chroma], axis=-1)
    out = nll_x = None
    if train and nll_targets is not None:
        # training loss path: decode + CE fused (modules.py helper); the
        # (B,T,V) log-prob tensor is skipped entirely on the kernel path
        nll_x = global_decoder_teacher_nll(_global_view(params), z, x_oh,
                                           tokens, nll_targets,
                                           use_pallas=pal)
    elif train:
        out = global_decoder_teacher(_global_view(params), z, x_oh,
                                     use_pallas=pal, tokens=tokens)
    else:
        out = global_decoder_greedy(_global_view(params), z, x_oh.shape[1])

    return {
        "out": out, "nll_x": nll_x, "r_out": r_out, "n_out": n_out,
        "mu_r": mu_r, "std_r": std_r, "mu_n": mu_n, "std_n": std_n,
        "z_r": z_r, "z_n": z_n, "z": z,
    }


# ===========================================================================
# MusicAttrSingleVAE — one encoder, 2*z latent (Pati et al. baseline)
# (reference model_v2.py:174-285)
# ===========================================================================


def init_single_vae(key, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    ks = iter(jax.random.split(key, 8))
    p = {
        "gru": bigru_init(next(ks), V, H, dtype),
        # 2*z_dims latent to match disentangled capacity (model_v2.py:198)
        "mu": linear_init(next(ks), 2 * H, 2 * Z, dtype),
        "var": linear_init(next(ks), 2 * H, 2 * Z, dtype),
    }
    z_total = 2 * Z + cfg.chroma_dims
    p.update(global_decoder_init(next(ks), z_total, V, H, dtype))
    return p


def single_vae_encode(params, x_oh, use_pallas: bool = False, tokens=None):
    if "enc_1" in params:
        return encode_streams_fused_packed(
            params["enc_1"], [(params["mu"], params["var"])], x_oh,
            use_pallas=use_pallas, tokens=tokens)[0]
    view = {"gru": params["gru"], "mu": params["mu"], "var": params["var"]}
    return encode_streams_fused([view], x_oh, use_pallas=use_pallas,
                                tokens=tokens)[0]


def single_vae_forward(params, rng, x_oh, chroma, cfg: ModelConfig,
                       train: bool = True, tokens=None,
                       nll_targets=None) -> Dict:
    """reference model_v2.py:264-285: forward takes (x, chroma) only."""
    pal = cfg.use_pallas_gru
    mu, std = single_vae_encode(params, x_oh, use_pallas=pal, tokens=tokens)
    z = reparameterize(rng, mu, std)
    z_full = jnp.concatenate([z, chroma], axis=-1)
    out = nll_x = None
    if train and nll_targets is not None:
        nll_x = global_decoder_teacher_nll(_global_view(params), z_full,
                                           x_oh, tokens, nll_targets,
                                           use_pallas=pal)
    elif train:
        out = global_decoder_teacher(_global_view(params), z_full, x_oh,
                                     use_pallas=pal, tokens=tokens)
    else:
        out = global_decoder_greedy(_global_view(params), z_full, x_oh.shape[1])
    return {"out": out, "nll_x": nll_x, "mu": mu, "std": std, "z": z,
            "z_full": z_full}


def single_vae_global_decode(params, z_full, steps: int):
    return global_decoder_greedy(_global_view(params), z_full, steps)


# ===========================================================================
# MusicAttrCVAE — one encoder over [x, r_density, n_density]; decoder
# conditioned on the densities (reference model_v2.py:288-423)
# ===========================================================================


def init_cvae(key, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    cdtl = 2  # (r_density, n_density) — reference model_v2.py:315
    ks = iter(jax.random.split(key, 8))
    p = {
        "gru_e": bigru_init(next(ks), V + cdtl, H, dtype),
        "mu": linear_init(next(ks), 2 * H, Z, dtype),
        "var": linear_init(next(ks), 2 * H, Z, dtype),
        # unused classifier heads (model_v2.py:307-308)
        "c_r": linear_init(next(ks), Z, 3, dtype),
        "c_n": linear_init(next(ks), Z, 3, dtype),
    }
    p.update(global_decoder_init(next(ks), Z + cdtl, V, H, dtype))
    return p


def cvae_encode(params, x_oh, r_density, n_density,
                use_pallas: bool = False):
    """Conditions are repeated along time and concatenated to the tokens
    (reference model_v2.py:342-354). r/n_density: (B, 1).

    The encoder input is [one-hot ⊕ 2 conditions] — NOT pure one-hot — so
    the embedded-token kernel never applies here, but the generic stacked
    GRU kernel (ops/pallas_gru.stacked_gru_scan_pallas) does."""
    B, T, _ = x_oh.shape
    cond = jnp.concatenate([r_density, n_density], axis=-1)        # (B, 2)
    cond_rep = jnp.broadcast_to(cond[:, None, :], (B, T, 2)).astype(x_oh.dtype)
    x_in = jnp.concatenate([x_oh, cond_rep], axis=-1)
    if "enc_e" in params:
        return encode_streams_fused_packed(
            params["enc_e"], [(params["mu"], params["var"])], x_in,
            use_pallas=use_pallas)[0]
    view = {"gru": params["gru_e"], "mu": params["mu"], "var": params["var"]}
    return encode_streams_fused([view], x_in, use_pallas=use_pallas)[0]


def cvae_forward(params, rng, x_oh, chroma, r_density, n_density,
                 cfg: ModelConfig, train: bool = True, tokens=None,
                 nll_targets=None) -> Dict:
    mu, std = cvae_encode(params, x_oh, r_density, n_density,
                          use_pallas=cfg.use_pallas_gru)
    z = reparameterize(rng, mu, std)
    z_full = jnp.concatenate(
        [z, r_density.astype(z.dtype), n_density.astype(z.dtype)], axis=-1)
    out = nll_x = None
    if train and nll_targets is not None:
        # the CVAE encoder input is [one-hot, conditions] (not pure
        # one-hot) so only the DECODER takes the fused token/CE kernel
        nll_x = global_decoder_teacher_nll(_global_view(params), z_full,
                                           x_oh, tokens, nll_targets,
                                           use_pallas=cfg.use_pallas_gru)
    elif train:
        out = global_decoder_teacher(_global_view(params), z_full, x_oh,
                                     use_pallas=cfg.use_pallas_gru,
                                     tokens=tokens)
    else:
        out = global_decoder_greedy(_global_view(params), z_full, x_oh.shape[1])
    return {"out": out, "nll_x": nll_x, "mu": mu, "std": std, "z": z,
            "z_full": z_full}


def cvae_global_decode(params, z_full, steps: int):
    return global_decoder_greedy(_global_view(params), z_full, steps)


# ===========================================================================
# MusicAttrFaderNets — CVAE + gradient-reversed latent discriminators
# (reference model_v2.py:438-586)
# ===========================================================================


def init_fader(key, cfg: ModelConfig, dtype=jnp.float32) -> Params:
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    cdtl = 2
    ks = iter(jax.random.split(key, 10))
    p = {
        "gru_e": bigru_init(next(ks), V, H, dtype),   # encoder ignores conditions
        "mu": linear_init(next(ks), 2 * H, Z, dtype),
        "var": linear_init(next(ks), 2 * H, Z, dtype),
        "discriminator_r": linear_init(next(ks), Z, 1, dtype),
        "discriminator_n": linear_init(next(ks), Z, 1, dtype),
        "c_r": linear_init(next(ks), Z, 3, dtype),    # unused
        "c_n": linear_init(next(ks), Z, 3, dtype),    # unused
    }
    p.update(global_decoder_init(next(ks), Z + cdtl, V, H, dtype))
    return p


def fader_encode(params, x_oh, use_pallas: bool = False, tokens=None):
    if "enc_e" in params:
        return encode_streams_fused_packed(
            params["enc_e"], [(params["mu"], params["var"])], x_oh,
            use_pallas=use_pallas, tokens=tokens)[0]
    view = {"gru": params["gru_e"], "mu": params["mu"], "var": params["var"]}
    return encode_streams_fused([view], x_oh, use_pallas=use_pallas,
                                tokens=tokens)[0]


def fader_forward(params, rng, x_oh, chroma, r_density, n_density,
                  cfg: ModelConfig, train: bool = True,
                  dropout_rng=None, tokens=None, nll_targets=None) -> Dict:
    """reference model_v2.py:559-586. The discriminators see a
    gradient-reversed z through ReLU + dropout(0.3).
    The encoder ignores the conditions (pure one-hot input), so both the
    embedded-token encoder kernel and the fused teacher-decoder kernel
    apply when `tokens` is given."""
    mu, std = fader_encode(params, x_oh, use_pallas=cfg.use_pallas_gru,
                           tokens=tokens)
    rng_z, rng_d = jax.random.split(rng)
    z = reparameterize(rng_z, mu, std)

    r_z = grad_reverse(z)
    disc_r = jax.nn.relu(linear_apply(params["discriminator_r"], r_z))
    disc_n = jax.nn.relu(linear_apply(params["discriminator_n"], r_z))
    if train:
        keep = 0.7
        kr, kn = jax.random.split(rng_d)
        disc_r = disc_r * jax.random.bernoulli(kr, keep, disc_r.shape) / keep
        disc_n = disc_n * jax.random.bernoulli(kn, keep, disc_n.shape) / keep

    z_full = jnp.concatenate(
        [z, r_density.astype(z.dtype), n_density.astype(z.dtype)], axis=-1)
    out = nll_x = None
    if train and nll_targets is not None:
        nll_x = global_decoder_teacher_nll(_global_view(params), z_full,
                                           x_oh, tokens, nll_targets,
                                           use_pallas=cfg.use_pallas_gru)
    elif train:
        out = global_decoder_teacher(_global_view(params), z_full, x_oh,
                                     use_pallas=cfg.use_pallas_gru,
                                     tokens=tokens)
    else:
        out = global_decoder_greedy(_global_view(params), z_full, x_oh.shape[1])
    return {"out": out, "nll_x": nll_x, "disc_r": disc_r, "disc_n": disc_n,
            "mu": mu, "std": std, "z": z, "z_full": z_full}


def fader_global_decode(params, z_full, steps: int):
    return global_decoder_greedy(_global_view(params), z_full, steps)
