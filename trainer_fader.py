#!/usr/bin/env python
"""Music FaderNets, Fader Networks (adversarial CVAE).

TPU-native equivalent of the reference `trainer_fader.py` entry point
(reference README.md:16-23): same public surface, jitted training.
Run: python trainer_fader.py [--epochs N] [--mesh DxM] [--fixed-quirks] ...
"""
from music_fader_nets_tpu.train.cli import run_training

if __name__ == "__main__":
    run_training("fader", __doc__.splitlines()[0], dual_corpus=False)
