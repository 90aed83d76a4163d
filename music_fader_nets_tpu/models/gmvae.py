"""GM-VAE model families — the paper's headline models.

`MusicAttrRegGMVAE` (reference gmm_model.py:10-259) shares the RegVAE
encoder / sub-decoder / global-decoder skeleton and adds a Gaussian-mixture
latent prior: trainable per-component mean tables (Xavier init) and fixed
logvar tables (init 2*pow_exp, non-trainable), plus the posterior-over-
components `approx_qy_x`. The reference's K-loop (gmm_model.py:213-215) is
replaced by one broadcast over the component axis.

`MusicAttrSingleGMVAE` (gmm_model.py:262-442) is the single-encoder variant
the reference defines but never trains; included for API parity.
"""
from __future__ import annotations

import math
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
)
from music_fader_nets_tpu.models.vae import (
    _global_view,
    _sub_pair_apply,
    init_reg_vae,
    reg_vae_encode,
)
from music_fader_nets_tpu.ops.gru import bigru_init, linear_init
from music_fader_nets_tpu.ops.sampling import reparameterize

LOG_2PI = math.log(2.0 * math.pi)


def _xavier_uniform(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def _mixture_tables(key, n_component: int, z_dims: int, pow_exp: float, dtype):
    """mu: Xavier-uniform trainable; logvar: constant log(exp(pow_exp)^2) =
    2*pow_exp, frozen (reference gmm_model.py:151-184)."""
    kr, kn = jax.random.split(key)
    init_logvar = 2.0 * pow_exp
    return {
        "mu_r_lookup": _xavier_uniform(kr, (n_component, z_dims), dtype),
        "mu_n_lookup": _xavier_uniform(kn, (n_component, z_dims), dtype),
        "logvar_r_lookup": jnp.full((n_component, z_dims), init_logvar, dtype),
        "logvar_n_lookup": jnp.full((n_component, z_dims), init_logvar, dtype),
    }


def approx_qy_x(z: jax.Array, mu_lookup: jax.Array,
                logvar_lookup: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """q(y|x) ~= p(y|z) over GMM components (reference gmm_model.py:194-218,
    eq.13 of the GMVAE paper), vectorized over K.

    z: (B, D); lookups: (K, D). Returns (logLogit (B, K), qy_x (B, K)).
    """
    logvar = jax.lax.stop_gradient(logvar_lookup)  # frozen table
    diff2 = (z[:, None, :] - mu_lookup[None]) ** 2                  # (B, K, D)
    llh = -0.5 * (diff2 / jnp.exp(logvar)[None] + logvar[None] + LOG_2PI)
    llh = jnp.sum(llh, axis=-1)                                      # (B, K)
    log_logit = llh + math.log(1.0 / mu_lookup.shape[0])
    return log_logit, jax.nn.softmax(log_logit, axis=-1)


# ===========================================================================
# MusicAttrRegGMVAE
# ===========================================================================


def init_reg_gmvae(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    p = init_reg_vae(k1, cfg, dtype)
    # pow_exp=-2 hyperparameter (reference gmm_model.py:71)
    p.update(_mixture_tables(k2, cfg.num_clusters, cfg.z_dims, -2.0, dtype))
    return p


def reg_gmvae_encode(params, x_oh):
    return reg_vae_encode(params, x_oh)


def reg_gmvae_global_decode(params, z, steps: int):
    return global_decoder_greedy(_global_view(params), z, steps)


def reg_gmvae_decode_tokens(params, z, steps: int, use_pallas: bool = True):
    from music_fader_nets_tpu.ops.pallas_decode import greedy_decode_tokens
    return greedy_decode_tokens(_global_view(params), z, steps, use_pallas)


def reg_gmvae_sample_tokens(params, z, steps: int, key,
                            temperature: float = 1.0,
                            use_pallas: bool = True):
    """Gumbel-max sampling decode (TPU-native addition; the reference only
    decodes greedily — model_v2.py:72-79). temperature <= 0 is greedy."""
    from music_fader_nets_tpu.ops.pallas_decode import sample_decode_tokens
    return sample_decode_tokens(_global_view(params), z, steps, key,
                                temperature, use_pallas)


def reg_gmvae_forward(params, rng, x_oh, r_oh, n_oh, chroma,
                      cfg: ModelConfig, train: bool = True,
                      tokens=None, nll_targets=None, track_ids=None) -> Dict:
    """reference gmm_model.py:220-259; returns reconstruction outputs plus the
    per-stream mixture posteriors and inferred components."""
    pal = cfg.use_pallas_gru
    (mu_r, std_r), (mu_n, std_n) = reg_vae_encode(params, x_oh,
                                                  use_pallas=pal,
                                                  tokens=tokens)
    rng_r, rng_n = jax.random.split(rng)
    z_r = reparameterize(rng_r, mu_r, std_r)
    z_n = reparameterize(rng_n, mu_n, std_n)

    log_logit_r, qy_x_r = approx_qy_x(z_r, params["mu_r_lookup"],
                                      params["logvar_r_lookup"])
    log_logit_n, qy_x_n = approx_qy_x(z_n, params["mu_n_lookup"],
                                      params["logvar_n_lookup"])

    r_out, n_out = _sub_pair_apply(
        params, r_oh, n_oh, z_r, z_n,
        cfg.faithful_subdecoder_softmax_axis, use_pallas=pal,
        track_ids=track_ids)

    z = jnp.concatenate([z_r, z_n, chroma], axis=-1)
    out = nll_x = None
    if train and nll_targets is not None:
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
        "log_logit_r": log_logit_r, "qy_x_r": qy_x_r,
        "log_logit_n": log_logit_n, "qy_x_n": qy_x_n,
        "y_r": jnp.argmax(qy_x_r, axis=-1), "y_n": jnp.argmax(qy_x_n, axis=-1),
    }


# ===========================================================================
# MusicAttrSingleGMVAE (defined-but-untrained in the reference; API parity)
# ===========================================================================


def init_single_gmvae(key, cfg: ModelConfig, dtype=jnp.float32) -> Dict:
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    ks = iter(jax.random.split(key, 6))
    p = {
        "gru": bigru_init(next(ks), V, H, dtype),
        "mu": linear_init(next(ks), 2 * H, Z, dtype),
        "var": linear_init(next(ks), 2 * H, Z, dtype),
        "linear_init": linear_init(next(ks), Z, H, dtype),  # unused, parity
    }
    # decoder conditions on z only (reference gmm_model.py:291-292)
    p.update(global_decoder_init(next(ks), Z, V, H, dtype))
    k2 = next(ks)
    tables = _mixture_tables(k2, cfg.num_clusters, cfg.z_dims, -1.0, dtype)
    # single-stream: one mu/logvar table (reference gmm_model.py:352-372)
    p["mu_lookup"] = tables["mu_r_lookup"]
    p["logvar_lookup"] = tables["logvar_r_lookup"]
    return p


def single_gmvae_forward(params, rng, x_oh, cfg: ModelConfig,
                         train: bool = True, tokens=None) -> Dict:
    pal = cfg.use_pallas_gru
    if "enc_1" in params:
        mu, std = encode_streams_fused_packed(
            params["enc_1"], [(params["mu"], params["var"])], x_oh,
            use_pallas=pal, tokens=tokens)[0]
    else:
        view = {"gru": params["gru"], "mu": params["mu"],
                "var": params["var"]}
        mu, std = encode_streams_fused([view], x_oh, use_pallas=pal,
                                       tokens=tokens)[0]
    z = reparameterize(rng, mu, std)
    log_logit, qy_x = approx_qy_x(z, params["mu_lookup"], params["logvar_lookup"])
    if train:
        out = global_decoder_teacher(_global_view(params), z, x_oh,
                                     use_pallas=pal, tokens=tokens)
    else:
        out = global_decoder_greedy(_global_view(params), z, x_oh.shape[1])
    return {"out": out, "mu": mu, "std": std, "z": z,
            "log_logit": log_logit, "qy_x": qy_x,
            "y": jnp.argmax(qy_x, axis=-1)}
