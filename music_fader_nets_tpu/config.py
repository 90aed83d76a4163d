"""Configuration for Music FaderNets TPU models and trainers.

Mirrors the reference's flat JSON configs (`model_config_v2.json:1-11`,
`gmm_model_config.json:1-12` in the reference repo) while adding TPU-specific
fields (mesh shape, precision) and flags that gate faithful replication of
reference quirks (see SURVEY.md §2.4).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional

# Model dimension constants, duplicated at the top of every reference
# trainer/test (reference trainer.py:32-35, test_class.py:26-31).
EVENT_DIMS = 342
RHYTHM_DIMS = 3
NOTE_DIMS = 16
CHROMA_DIMS = 24
TEMPO_DIMS = 264      # defined but unused by the reference; kept for parity
VELOCITY_DIMS = 126   # defined but unused by the reference; kept for parity


@dataclasses.dataclass
class ModelConfig:
    """Model + training hyperparameters.

    Defaults replicate the reference `model_config_v2.json`.
    """
    # --- reference JSON fields ---
    batch_size: int = 128
    n_epochs: int = 30
    lr: float = 1e-3
    decay: float = 0.9999          # dead in the reference (ExponentialLR never built)
    name: str = "music_attr_vae"
    hidden_dims: int = 512
    z_dims: int = 128
    beta: float = 0.2
    time_step: int = 32
    num_clusters: int = 2          # GM-VAE only (gmm_model_config.json:11)

    # --- model dims ---
    roll_dims: int = EVENT_DIMS
    rhythm_dims: int = RHYTHM_DIMS
    note_dims: int = NOTE_DIMS
    chroma_dims: int = CHROMA_DIMS

    # --- sequence geometry (static shapes for XLA) ---
    seq_len: int = 100             # padded token length ("short" corpus, ptb_v2.py:301)
    attr_len: int = 16             # rhythm/note track length (beat_res*num_beats)
    eval_decode_steps: int = 100   # reference test_class.py:253
    transfer_decode_steps: int = 300  # reference arousal_transfer.ipynb cells 15/17

    # --- TPU execution ---
    dtype: str = "float32"         # compute dtype for parity runs; "bfloat16" for speed
    # fused Pallas GRU scan (ops/pallas_gru.py) for training recurrences:
    # ~2x f32 on fwd+grad. Composes with pure-dp meshes via shard_map over
    # the data axis (weight grads psum'd); under tp meshes (model axis > 1)
    # the dispatch falls back to the GSPMD-partitionable XLA scan.
    use_pallas_gru: bool = False
    data_axis: str = "data"
    model_axis: str = "model"

    # --- faithful-quirk flags (SURVEY.md §2.4). True = replicate reference. ---
    # KL anneal window that yields *negative* beta for steps in (1000, 10000)
    # (reference trainer.py:93-96).
    faithful_negative_beta: bool = True
    # Sub-decoder log_softmax over the TIME axis (dim=1 on a (B,T,C) tensor,
    # reference model_v2.py:109,114) instead of the class axis.
    faithful_subdecoder_softmax_axis: bool = True
    # GLSR soft rhythm density uses batch element 0's played-note vector for
    # every sample (reference trainer_glsr.py:154 `played_notes[0][i]`).
    faithful_glsr_batch0: bool = True

    # --- TPU-repo training extensions (not in the reference) ---
    # kl_warmup_steps > 0 replaces the reference anneal with a plain linear
    # 0 -> beta warmup over that many steps. Rationale: the reference
    # schedule (even quirk-fixed) stays at beta=0 until step 10000, so short
    # runs (the synthetic demo trains ~1600 steps) apply NO KL at all —
    # this knob lets the demo actually exercise KL pressure.
    kl_warmup_steps: int = 0
    # free_bits > 0 floors each latent dimension's KL at this many nats
    # before averaging (Kingma et al. 2016 "free bits"): KL pressure stops
    # collapsing dims that already encode less than the floor. Applied to
    # the N(0,1) KL of the vanilla/glsr/cvae/fader/singlevae ELBOs and to
    # the GM-VAE component KLs. 0 = off (reference behavior).
    free_bits: float = 0.0

    @property
    def ce_x_weight(self) -> float:
        """Reconstruction CE weight on the token stream (reference trainer.py:105)."""
        return 5.0


_KEY_ALIASES = {
    "hidden_dim": "hidden_dims",
    "z_dim": "z_dims",
}


def load_config(path: Optional[str] = None, **overrides) -> ModelConfig:
    """Load a reference-format JSON config (flat dict) into a ModelConfig.

    Accepts the reference's key names (`hidden_dim`, `z_dim`) as aliases.
    Unknown keys are ignored so both reference JSON files load unchanged.
    """
    fields = {f.name for f in dataclasses.fields(ModelConfig)}
    kwargs = {}
    if path is not None:
        with open(path) as f:
            raw = json.load(f)
        for k, v in raw.items():
            k = _KEY_ALIASES.get(k, k)
            if k in fields:
                kwargs[k] = v
    kwargs.update({k: v for k, v in overrides.items() if k in fields})
    return ModelConfig(**kwargs)
