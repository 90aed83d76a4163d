"""Synthetic corpus generator.

Produces arrays with the exact schema of the reference's cached corpus
(`data/values_v3/{data,rhythm,note_density,chroma}.npy`, reference
ptb_v2.py:336-339) so every downstream component — datasets, trainers,
evaluators, benchmarks — runs without the (unreleased) Yamaha/VGMIDI MIDI
corpora. Sequences follow the 342-token MidiPerformance grammar
(note-on 2-89 / note-off 90-177 / time-shift 178-277 / velocity 278-341,
EOS=1, PAD=0; reference ptb_v2.py:25-35, trainer_glsr.py:125-133) and the
corpus invariants the reference filters for (rhythm starts with an onset,
ptb_v2.py:264; top-3 chroma bins, ptb_v2.py:352-356).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from music_fader_nets_tpu.config import CHROMA_DIMS

EOS = 1
NOTE_ON_LO, NOTE_ON_HI = 2, 89        # pitch 21..108
NOTE_OFF_LO, NOTE_OFF_HI = 90, 177
SHIFT_LO, SHIFT_HI = 178, 277
VEL_LO, VEL_HI = 278, 341


def synth_corpus(n_segments: int = 2048, seq_len: int = 100, attr_len: int = 16,
                 seed: int = 777) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (data (N, seq_len) int, rhythm (N, attr_len) int,
    note_density (N, attr_len) int, chroma (N, 24) float)."""
    rng = np.random.default_rng(seed)

    data = np.zeros((n_segments, seq_len), dtype=np.int64)
    rhythm = np.zeros((n_segments, attr_len), dtype=np.int64)
    note_density = np.zeros((n_segments, attr_len), dtype=np.int64)
    chroma = np.zeros((n_segments, CHROMA_DIMS), dtype=np.float64)

    for i in range(n_segments):
        # token stream: alternating chords of note-on(+vel) and time shifts,
        # later note-offs — grammatically valid performance encoding.
        toks = []
        held = []
        length_budget = rng.integers(seq_len // 2, seq_len - 1)
        while len(toks) < length_budget - 2:
            n_notes = int(rng.integers(1, 4))
            for _ in range(n_notes):
                pitch_tok = int(rng.integers(NOTE_ON_LO, NOTE_ON_HI + 1))
                toks.append(pitch_tok)
                toks.append(int(rng.integers(VEL_LO, VEL_HI + 1)))
                held.append(pitch_tok)
            toks.append(int(rng.integers(SHIFT_LO, SHIFT_HI + 1)))
            if held and rng.random() < 0.5:
                off = held.pop(int(rng.integers(len(held))))
                toks.append(off - NOTE_ON_LO + NOTE_OFF_LO)
        toks = toks[: seq_len - 1]
        toks.append(EOS)
        data[i, : len(toks)] = toks

        # rhythm track: 3 classes, always starting with an onset (class 1)
        rhythm[i] = rng.choice([0, 1, 2], size=attr_len, p=[0.25, 0.5, 0.25])
        rhythm[i, 0] = 1

        # note density per step, 0..15
        note_density[i] = rng.integers(0, 13, size=attr_len)

        # chroma: weighted key vector, top-3 bins kept (post-sanitization form)
        full = rng.random(CHROMA_DIMS)
        top3 = np.argsort(-full)[:3]
        c = np.zeros(CHROMA_DIMS)
        c[top3] = full[top3]
        chroma[i] = c

    return data, rhythm, note_density, chroma


def synth_vgmidi(n_segments: int = 512, seq_len: int = 100, attr_len: int = 16,
                 seed: int = 778):
    """Synthetic VGMIDI-shaped corpus with arousal/valence labels
    (reference ptb_v2.py:371-397)."""
    data, rhythm, note, chroma = synth_corpus(n_segments, seq_len, attr_len, seed)
    rng = np.random.default_rng(seed + 1)
    arousal = rng.uniform(-1.0, 1.0, size=n_segments)
    valence = rng.uniform(-1.0, 1.0, size=n_segments)
    return data, rhythm, note, arousal, valence, chroma
