"""Musical attribute extraction from a pianoroll segment.

Equivalent of the reference's `get_music_attributes`
(reference ptb_v2.py:132-156): per-step 3-class rhythm track, note density
(#sounding pitches), 12-bin chroma sums, and mean velocity — all derived
through the event codec's pitch-list view for identical semantics.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from music_fader_nets_tpu.tokenizer.event_codec import (
    encode_pianoroll,
)


def get_music_attributes(pr: np.ndarray, beat: int = 24
                         ) -> Tuple[list, list, np.ndarray, np.ndarray, np.ndarray]:
    """pr (T, 128) velocity roll -> (events, rhythm, note_density, chroma,
    velocity). `beat` kept for signature parity; the roll is already
    quantized."""
    events, pitch_lst, _, rhythm = encode_pianoroll(pr)

    note_density = np.array([len(k) for k in pitch_lst])

    chroma = np.zeros((pr.shape[0], 12))
    for note in range(12):
        chroma[:, note] = np.sum(pr[:, note::12], axis=1)

    velocity = np.zeros(len(pr), dtype=int)
    for i in range(len(pr)):
        nz = np.nonzero(pr[i])[0]
        if len(nz) > 0:
            velocity[i] = int(np.sum(pr[i]) / len(nz))

    return events, rhythm, note_density, chroma, velocity


def rhythm_density(rhythm) -> float:
    """Fraction of steps that are onsets (reference ptb_v2.py:421)."""
    rhythm = np.asarray(rhythm)
    return float((rhythm == 1).sum() / len(rhythm))


def note_density_mean(note_density) -> float:
    """Mean per-step note count (reference ptb_v2.py:422)."""
    nd = np.asarray(note_density)
    return float(nd.sum() / len(nd))
