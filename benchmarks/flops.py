"""Analytic matmul-FLOPs accounting per optimizer step, per model family.

Used by bench.py to turn measured step times into `tflops` and `mfu`
fields — the defensible perf headline (the torch-CPU `vs_baseline` ratio is
kept only as a secondary, historical field).

Counting rules (documented so the MFU numerator is reproducible):
  * Only matmul FLOPs are counted, at 2*M*N*K per (M,K)@(K,N). VPU
    elementwise work (gate math, softmax) and reductions are excluded —
    they are bandwidth/VPU-bound, not MXU work, and including them would
    inflate MFU.
  * One-hot input projections that the implementation executes as row
    GATHERS are excluded: the embedded-token encoder kernel, the
    class-embedded sub-decoder kernel, and the decoder's teacher-token
    embedding never run those matmuls (ops/pallas_gru.py), and their
    backward dW_ih is a scatter-add. Counting them would credit FLOPs the
    hardware never performs. The CVAE encoder is the exception: its input
    is [one-hot + 2 densities], a DENSE (B*T, V+2)@(V+2, 3H) matmul that
    really executes, so it is counted.
  * Backward = 2x forward for every counted matmul (dX through W^T plus
    dW through the activations), the standard convention; the gate-stash
    kernels (docs/kernels.md) execute exactly this — no recompute matmuls.
  * Small heads (mu/var, sub-decoder/ discriminator outputs, h0 inits,
    GMM prior) are counted where one line suffices; their total is <1% of
    a step.

Reference geometry (bench defaults): B=128, T=100 tokens, Ta=16 attribute
steps, H=512, Z=128, V=342, chroma=24.
"""
from __future__ import annotations

from music_fader_nets_tpu.config import ModelConfig

# v5e peak dense matmul throughput, bf16 (jax-ml.github.io/scaling-book
# hardware table: 197 TFLOP/s per chip). MFU is reported against this
# number for bf16 runs; f32 runs report tflops only (f32 matmuls lower to
# multi-pass bf16 on the MXU, so no single peak is defensible).
V5E_PEAK_BF16_FLOPS = 197e12


def _gru_recurrence(B: int, T: int, H: int) -> float:
    """T sequential steps of h@w_hh: (B,H)@(H,3H)."""
    return T * 2.0 * B * H * 3 * H


def _dense_inproj(B: int, T: int, I: int, H: int) -> float:
    """Hoisted full-sequence input projection (B*T, I)@(I, 3H)."""
    return 2.0 * B * T * I * 3 * H


def _global_decoder(B: int, T: int, H: int, V: int) -> float:
    """Fused 2-layer teacher decoder (ops/pallas_gru.py): per step, layer-1
    recurrence + layer-2 input projection from h1 + layer-2 recurrence
    (3 matmuls of (B,H)@(H,3H)) + the logits head (B,H)@(H,V). The token
    half of layer 1's input projection is an embedding gather (excluded);
    the z half is one (B,Z)@(Z,3H) per sequence, counted by the caller."""
    return T * (3 * 2.0 * B * H * 3 * H + 2.0 * B * H * V)


def train_step_flops(cfg: ModelConfig, family: str = "gmm") -> float:
    """Analytic fwd+bwd matmul FLOPs of one optimizer step of `family`
    at `cfg`'s geometry, under the counting rules above."""
    B, T, Ta = cfg.batch_size, cfg.seq_len, cfg.attr_len
    H, Z, V = cfg.hidden_dims, cfg.z_dims, cfg.roll_dims
    C = cfg.chroma_dims

    fwd = 0.0
    if family in ("vanilla", "glsr", "gmm"):
        # 2 disentangled streams x 2 directions, embedded-token inputs
        enc_dirs = 4
        fwd += enc_dirs * _gru_recurrence(B, T, H)
        # mu/var heads: 2 streams x 2 heads of (B,2H)@(2H,Z)
        fwd += 4 * 2.0 * B * 2 * H * Z
        # sub-decoders: 2 streams, class-embedded inputs (gather) + one
        # z projection (B,Z)@(Z,3H) each, recurrence over Ta, small heads
        fwd += 2 * (_gru_recurrence(B, Ta, H) + 2.0 * B * Z * 3 * H
                    + 2.0 * B * Z * H)            # linear_init_{r,n}
        fwd += 2.0 * B * Ta * H * cfg.rhythm_dims + \
            2.0 * B * Ta * H * cfg.note_dims      # track heads
        z_total = 2 * Z + C
    elif family == "singlevae":
        fwd += 2 * _gru_recurrence(B, T, H)       # 1 stream x 2 directions
        fwd += 2 * 2.0 * B * 2 * H * (2 * Z)      # mu/var at 2Z latent
        z_total = 2 * Z + C
    elif family in ("cvae", "fader"):
        fwd += 2 * _gru_recurrence(B, T, H)
        if family == "cvae":
            # dense [one-hot + 2 conditions] input: really a matmul
            fwd += 2 * _dense_inproj(B, T, V + 2, H)
        # fader's encoder input is pure one-hot -> embedded (gather)
        fwd += 2 * 2.0 * B * 2 * H * Z            # mu/var heads
        fwd += 2 * 2.0 * B * Z * 1 if family == "fader" else 0.0
        z_total = Z + 2
    else:
        raise ValueError(f"unknown family {family!r}")

    # global decoder: h0 init + z half of layer-1 pre + the fused loop
    fwd += 2.0 * B * z_total * H                  # linear_init_global
    fwd += 2.0 * B * z_total * 3 * H              # z @ w_z (once/sequence)
    fwd += _global_decoder(B, T, H, V)

    if family == "glsr":
        # the GLSR regularizer decodes 4 z-perturbations in one 4B-row
        # masses kernel (losses/regularizers.py:229-246): same per-row
        # decoder cost, masses head == logits head then masked sums
        z4 = 4 * B
        fwd += 2.0 * z4 * z_total * H + 2.0 * z4 * z_total * 3 * H
        fwd += _global_decoder(z4, T, H, V)

    # backward = 2x forward for every counted matmul
    return 3.0 * fwd


def step_tflops(cfg: ModelConfig, step_seconds: float,
                family: str = "gmm") -> float:
    return train_step_flops(cfg, family) / step_seconds / 1e12


def step_mfu(cfg: ModelConfig, step_seconds: float, family: str = "gmm",
             peak_flops: float = V5E_PEAK_BF16_FLOPS) -> float:
    return train_step_flops(cfg, family) / step_seconds / peak_flops


if __name__ == "__main__":
    cfg = ModelConfig(num_clusters=2, seq_len=100, attr_len=16)
    for fam in ("vanilla", "gmm", "glsr", "cvae", "fader", "singlevae"):
        g = train_step_flops(cfg, fam) / 1e9
        print(f"{fam:10s} {g:8.1f} GFLOP/step")
