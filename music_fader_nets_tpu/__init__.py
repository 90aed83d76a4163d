"""music_fader_nets_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of gudgud96/music-fader-nets (Music FaderNets, Tan & Herremans,
ISMIR 2020).

This is NOT a port of the reference PyTorch code. The compute path is pure
functional JAX compiled by XLA onto the TPU MXU; autoregressive decoding runs
as `lax.scan` (and an optional Pallas kernel that pins decoder weights in
VMEM); parallelism is expressed via `jax.sharding.Mesh` + NamedSharding
(data + tensor axes) with XLA-inserted collectives.

Layout:
  ops/        GRU cells and scans with hoisted input matmuls, sampling
  models/     the 6 public model families (RegVAE, SingleVAE, CVAE,
              FaderNets, RegGMVAE, SingleGMVAE) as param-pytrees + pure fns
  losses/     ELBO terms, KL annealing, Pati/GLSR/adversarial/GMM regularizers
  train/      generic jit/pjit Trainer + per-model loss bundles
  data/       corpus builders (.npy cache schema of the reference), datasets
  tokenizer/  self-contained MIDI I/O, event codec (388 vocab),
              performance codec (342 vocab), attributes, key estimation
  parallel/   mesh construction and parameter/batch partition specs
  eval/       controllability harness (consistency/restrictiveness/monotonicity)
  transfer/   arousal style transfer (encode -> latent shift -> decode)
  utils/      checkpointing (orbax + .pt converter), profiling helpers
"""

__version__ = "0.1.0"

from music_fader_nets_tpu.config import ModelConfig, load_config  # noqa: F401
