"""Dataset views over corpus arrays.

Numpy equivalents of the reference's torch `Dataset`s
(reference ptb_v2.py:400-489) with identical split fractions and density
precomputation, but vectorized (no per-item Python) and returning
whole-array views so the batcher can gather directly.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _split(arr, mode: str, t_frac: float, v_frac: float):
    tlen, vlen = int(t_frac * len(arr)), int(v_frac * len(arr))
    if mode == "train":
        return arr[:tlen]
    if mode == "val":
        return arr[tlen:vlen]
    if mode == "test":
        return arr[vlen:]
    raise ValueError(mode)


class YamahaDataset:
    """80/10/10 contiguous split (reference ptb_v2.py:410). Precomputes
    r_density = fraction of rhythm steps == 1 and n_density = mean note count
    (ptb_v2.py:421-422)."""

    def __init__(self, data, rhythm, note, chroma, mode="train"):
        self.data = _split(np.asarray(data), mode, 0.8, 0.9).astype(np.int32)
        self.rhythm = _split(np.asarray(rhythm), mode, 0.8, 0.9).astype(np.int32)
        self.note = _split(np.asarray(note), mode, 0.8, 0.9).astype(np.int32)
        self.chroma = _split(np.asarray(chroma), mode, 0.8, 0.9).astype(np.float32)
        self.r_density = (self.rhythm == 1).mean(axis=-1).astype(np.float32)
        self.n_density = self.note.mean(axis=-1).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {
            "x": self.data[idx], "r": self.rhythm[idx], "n": self.note[idx],
            "c": self.chroma[idx],
            "r_density": self.r_density[idx], "n_density": self.n_density[idx],
        }

    def arrays(self) -> Dict[str, np.ndarray]:
        return {
            "x": self.data, "r": self.rhythm, "n": self.note, "c": self.chroma,
            "r_density": self.r_density, "n_density": self.n_density,
        }


class VGMIDIDataset:
    """90/5/5 contiguous split with arousal binarized at 0
    (reference ptb_v2.py:448,472-473). The reference re-inserts EOS before the
    pad position and re-pads ragged arrays (ptb_v2.py:459-470); corpus
    builders here already emit fixed-shape arrays with EOS in place, so only
    the label handling remains."""

    def __init__(self, data, rhythm, note, chroma, arousal, valence, mode="train"):
        self.data = _split(np.asarray(data), mode, 0.9, 0.95).astype(np.int32)
        self.rhythm = _split(np.asarray(rhythm), mode, 0.9, 0.95).astype(np.int32)
        self.note = _split(np.asarray(note), mode, 0.9, 0.95).astype(np.int32)
        self.chroma = _split(np.asarray(chroma), mode, 0.9, 0.95).astype(np.float32)
        arousal = _split(np.asarray(arousal), mode, 0.9, 0.95).astype(np.float32)
        self.valence = _split(np.asarray(valence), mode, 0.9, 0.95).astype(np.float32)
        self.arousal = (arousal >= 0).astype(np.int32)
        self.r_density = (self.rhythm == 1).mean(axis=-1).astype(np.float32)
        self.n_density = self.note.mean(axis=-1).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {
            "x": self.data[idx], "r": self.rhythm[idx], "n": self.note[idx],
            "c": self.chroma[idx], "a": self.arousal[idx], "v": self.valence[idx],
            "r_density": self.r_density[idx], "n_density": self.n_density[idx],
        }

    def arrays(self) -> Dict[str, np.ndarray]:
        return {
            "x": self.data, "r": self.rhythm, "n": self.note, "c": self.chroma,
            "a": self.arousal, "v": self.valence,
            "r_density": self.r_density, "n_density": self.n_density,
        }
