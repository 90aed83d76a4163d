#!/usr/bin/env python
"""Controllability evaluation, GM-VAE (MusicAttrRegGMVAE).

TPU-native equivalent of the reference `test_gmm_v2.py`
(reference README.md:38-40): prints Consistency / Restrictiveness /
Monotonicity (paper Table 1) for the rhythm and note faders. The 8-value
slider sweep decodes as ONE jitted batch per sample.
Run: python test_gmm_v2.py [--samples N] [--eval-epochs N] [--from-pt ckpt.pt]
"""
from music_fader_nets_tpu.eval.cli import run_evaluation

if __name__ == "__main__":
    run_evaluation("gmm", __doc__.splitlines()[0])
