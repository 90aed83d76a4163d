#!/usr/bin/env python
"""Micro-batched model server for fader-controlled generation.

Production form of the reference's `arousal_transfer.ipynb` inference
path: one fixed-shape compiled program (encode + latent shift + Pallas
greedy decode), micro-batched across concurrent requests. JSON lines over
stdin/stdout, or --tcp PORT, or --bench N for an offered-load measurement.
Run: python serve.py --kind gmm [--steps 300] [--bench 512] ...
"""
from music_fader_nets_tpu.serve.cli import run_server

if __name__ == "__main__":
    run_server()
