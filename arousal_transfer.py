#!/usr/bin/env python
"""Arousal style transfer CLI — the reference `arousal_transfer.ipynb`
pipeline (cells 8-17) as a script: load the GM-VAE checkpoint, pick a VGMIDI
test segment, shift its latent along the GMM component-mean direction, decode
300 steps as one jitted scan, and write the result as a MIDI file.

Run: python arousal_transfer.py [--direction low_to_high|high_to_low]
     [--lam 1.0] [--steps 300] [--index N] [--out transfer.mid]
"""
from __future__ import annotations


def main(argv=None):
    import numpy as np

    from music_fader_nets_tpu.eval.cli import _load_params
    from music_fader_nets_tpu.train.cli import (
        build_argparser, config_from_args, load_vgmidi,
    )
    from music_fader_nets_tpu.transfer.arousal import (
        arousal_transfer, transfer_to_midi,
    )

    ap = build_argparser(__doc__.splitlines()[0])
    ap.add_argument("--direction", default="low_to_high",
                    choices=["low_to_high", "high_to_low"])
    ap.add_argument("--lam", type=float, default=1.0,
                    help="transfer strength (notebook cell 15)")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--index", type=int, default=0,
                    help="VGMIDI test-set segment index")
    ap.add_argument("--temperature", type=float, default=0.0,
                    help="sampling temperature for the decode; 0 (default) "
                         "= the reference-faithful greedy argmax, >0 = "
                         "Gumbel-max sampling from softmax(logits/T) "
                         "(seeded by --seed, reproducible)")
    ap.add_argument("--out", default="transfer.mid")
    ap.add_argument("--wav", default=None, metavar="PATH",
                    help="also render an audio preview WAV (replaces the "
                         "notebook's fluidsynth playback, cell 2)")
    args = ap.parse_args(argv)

    cfg = config_from_args("gmm", args)
    params = _load_params("gmm", cfg, args)
    vgm = load_vgmidi(args)["test"]
    item = vgm[args.index % len(vgm)]
    import jax
    tokens, notes = arousal_transfer(params, cfg, item, args.direction,
                                     lam=args.lam, steps=args.steps,
                                     rng=jax.random.PRNGKey(args.seed),
                                     temperature=args.temperature)
    n_events = int(np.count_nonzero(np.asarray(tokens) > 1))
    print(f"direction={args.direction} lam={args.lam} steps={args.steps} "
          f"temperature={args.temperature} "
          f"-> {len(notes)} notes from {n_events} non-pad tokens")
    transfer_to_midi(notes, args.out)
    print(f"Wrote {args.out}")
    if args.wav:
        from music_fader_nets_tpu.transfer.audio import notes_to_wav
        sample_rate = 22050
        audio = notes_to_wav(notes, args.wav, sample_rate=sample_rate)
        print(f"Wrote {args.wav} "
              f"({audio.size / sample_rate:.1f}s audio preview)")


if __name__ == "__main__":
    main()
