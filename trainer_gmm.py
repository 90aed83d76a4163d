#!/usr/bin/env python
"""Music FaderNets, GM-VAE model (dual-corpus MusicAttrRegGMVAE).

TPU-native equivalent of the reference `trainer_gmm.py` entry point
(reference README.md:16-23): same public surface, jitted training.
Run: python trainer_gmm.py [--epochs N] [--mesh DxM] [--fixed-quirks] ...
"""
from music_fader_nets_tpu.train.cli import run_training

if __name__ == "__main__":
    run_training("gmm", __doc__.splitlines()[0], dual_corpus=True)
