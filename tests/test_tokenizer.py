"""Tokenizer stack tests: MIDI I/O round trip, event-codec round trip
(generalizing the reference's only self-verifying assert,
polyphonic_event_based_v2.py:417-424), performance-codec round trip,
attributes, key estimation, and the full file->corpus pipeline."""
import os

import numpy as np
import pytest

from music_fader_nets_tpu.tokenizer import event_codec, key_estimate, performance_codec
from music_fader_nets_tpu.tokenizer.attributes import get_music_attributes
from music_fader_nets_tpu.tokenizer.midi_io import (
    MidiData, MidiNote, read_midi, write_midi,
)
from music_fader_nets_tpu.tokenizer.pianoroll import quantize_pianoroll
from music_fader_nets_tpu.tokenizer.pipeline import build_corpus, process_file


def _random_pianoroll(rng, T=32, max_poly=4):
    # pitch 0 excluded: the codec (faithfully to the reference,
    # polyphonic_event_based_v2.py:93-95) drops pitch 0 on decode — MIDI
    # pitch 0 never occurs in real piano corpora
    pr = np.zeros((T, 128), np.uint8)
    for t in range(T):
        for p in rng.choice(np.arange(1, 128),
                            size=rng.integers(0, max_poly + 1),
                            replace=False):
            # sustain with some probability to create holds
            dur = int(rng.integers(1, 4))
            pr[t: t + dur, p] = int(rng.integers(1, 128))
    return pr


def test_event_codec_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        pr = _random_pianoroll(rng)
        events, _, _, _ = event_codec.encode_pianoroll(pr)
        pr2, _, _ = event_codec.decode_events(events)
        # pad decoded to original shape (trailing silent steps drop a row)
        out = np.zeros_like(pr)
        out[: pr2.shape[0]] = pr2[: pr.shape[0]]
        np.testing.assert_array_equal(pr.astype(int), out.astype(int))


def test_rhythm_classes():
    pr = np.zeros((4, 128), np.uint8)
    pr[0, 60] = 80          # onset
    pr[1, 60] = 80          # hold
    # step 2 silent -> rest
    pr[3, 62] = 90          # onset
    _, _, _, rhythm = event_codec.encode_pianoroll(pr)
    assert rhythm == [1, 2, 0, 1]


def test_performance_codec_roundtrip():
    notes = [
        MidiNote(60, 80, 0.00, 0.50),
        MidiNote(64, 90, 0.00, 0.25),
        MidiNote(67, 70, 0.30, 0.80),
        MidiNote(21, 127, 1.00, 2.50),
        MidiNote(108, 1, 1.00, 1.10),
    ]
    toks = performance_codec.performance_encode(notes)
    assert all(2 <= t < 342 for t in toks)
    back = performance_codec.performance_decode(toks)
    assert len(back) == len(notes)
    for a, b in zip(sorted(notes, key=lambda n: (n.start, n.pitch)), back):
        assert a.pitch == b.pitch
        assert abs(a.start - b.start) <= 0.005         # 10ms quantization
        assert abs(a.end - b.end) <= 0.005
        # velocity survives up to bin width (2)
        assert abs(a.velocity - b.velocity) <= 2


def test_performance_vocab_layout():
    """Token roles fixed by the reference masks (trainer_glsr.py:125-133)."""
    assert performance_codec.NOTE_ON_BASE == 2
    assert performance_codec.NOTE_OFF_BASE == 90
    assert performance_codec.SHIFT_BASE == 178
    assert performance_codec.VEL_BASE == 278
    assert performance_codec.EVENT_DIMS == 342
    # a 1-second gap = one max shift token (278 would exceed); 1.5s = two
    notes = [MidiNote(60, 80, 0.0, 0.1), MidiNote(62, 80, 1.6, 1.7)]
    toks = performance_codec.performance_encode(notes)
    shifts = [t for t in toks if 178 <= t < 278]
    assert 178 + 99 in shifts                          # a full 100-step shift


def test_midi_io_roundtrip(tmp_path):
    md = MidiData(
        notes=[MidiNote(60, 80, 0.0, 0.5), MidiNote(64, 100, 0.5, 1.0),
               MidiNote(67, 60, 1.0, 2.0)],
        tempo_changes=[(0.0, 120.0)],
        time_signatures=[(0.0, 4, 4)])
    p = str(tmp_path / "t.mid")
    write_midi(md, p)
    back = read_midi(p)
    assert len(back.notes) == 3
    for a, b in zip(md.notes, back.notes):
        assert a.pitch == b.pitch
        assert abs(a.start - b.start) < 2e-3
        assert abs(a.end - b.end) < 2e-3
        assert abs(a.velocity - b.velocity) <= 0
    assert abs(back.tempo_changes[0][1] - 120.0) < 0.01


def test_midi_io_tempo_change(tmp_path):
    md = MidiData(
        notes=[MidiNote(60, 80, 0.0, 4.0)],
        tempo_changes=[(0.0, 120.0), (2.0, 60.0)],
        time_signatures=[(0.0, 4, 4)])
    p = str(tmp_path / "t.mid")
    write_midi(md, p)
    back = read_midi(p)
    assert len(back.tempo_changes) == 2
    assert abs(back.tempo_changes[1][1] - 60.0) < 0.01
    # beats: 0.5s apart for 2s, then 1s apart
    beats = back.get_beats(0.0)
    assert abs(beats[1] - 0.5) < 1e-2
    assert abs(beats[5] - 3.0) < 5e-2


def test_quantize_pianoroll():
    md = MidiData(notes=[MidiNote(60, 80, 0.0, 1.0),
                         MidiNote(64, 90, 1.0, 1.5)],
                  tempo_changes=[(0.0, 120.0)],
                  time_signatures=[(0.0, 4, 4)])
    md.end_time = 2.0
    pr = quantize_pianoroll(md, beat_resolution=4)
    # 120bpm -> beat=0.5s -> step=0.125s; note 0: steps 0..8
    assert pr[0, 60] == 80 and pr[7, 60] == 80
    assert pr[8, 64] == 90


def test_attributes():
    pr = np.zeros((8, 128), np.uint8)
    pr[0:2, 60] = 100
    pr[0:2, 64] = 50
    pr[4, 72] = 80
    events, rhythm, nd, chroma, vel = get_music_attributes(pr, beat=4)
    assert list(nd) == [2, 2, 0, 0, 1, 0, 0, 0]
    assert rhythm[0] == 1 and rhythm[1] == 2 and rhythm[2] == 0
    assert chroma[0, 0] == 100 and chroma[0, 4] == 50    # C and E
    assert vel[0] == 75 and vel[4] == 80


def test_key_estimation_c_major():
    # C major scale, duration-weighted
    notes = [MidiNote(60 + s, 80, i * 0.5, i * 0.5 + 0.5)
             for i, s in enumerate([0, 2, 4, 5, 7, 9, 11, 12])]
    v = key_estimate.harmony_vector_from_notes(notes, is_one_hot=True)
    assert v is not None and v[0] == 1.0                 # C major wins
    w = key_estimate.harmony_vector_from_notes(notes, is_one_hot=False)
    assert w[0] > 0.5                                    # strong correlation
    # A minor (relative) should also be a positive candidate
    assert w[12 + 9] > 0.0


def test_key_estimation_a_minor():
    notes = [MidiNote(57 + s, 80, i * 0.5, i * 0.5 + 0.5)
             for i, s in enumerate([0, 2, 3, 5, 7, 8, 11, 12])]  # harmonic minor
    v = key_estimate.harmony_vector_from_notes(notes, is_one_hot=True)
    assert v is not None and v[12 + 9] == 1.0            # A minor


@pytest.fixture(scope="module")
def midi_corpus(tmp_path_factory):
    """A tiny synthetic MIDI corpus on disk."""
    d = tmp_path_factory.mktemp("midis")
    rng = np.random.default_rng(7)
    paths = []
    for i in range(3):
        notes = []
        t = 0.0
        for _ in range(64):
            n_chord = int(rng.integers(1, 4))
            pitches = rng.choice(np.arange(48, 84), size=n_chord, replace=False)
            dur = float(rng.choice([0.25, 0.5]))
            for p in pitches:
                notes.append(MidiNote(int(p), int(rng.integers(40, 120)),
                                      t, t + dur))
            t += dur
        md = MidiData(notes, [(0.0, 120.0)], [(0.0, 4, 4)], end_time=t)
        p = str(d / f"piece_{i}.mid")
        write_midi(md, p)
        paths.append(p)
    return paths


def test_process_file_and_build_corpus(midi_corpus):
    data, rhythm, nd, chroma = build_corpus(midi_corpus, n_workers=1)
    assert len(data) > 0
    assert data.shape[1] <= 100
    assert rhythm.shape[1] == 16 and nd.shape[1] == 16 and chroma.shape[1] == 24
    # every kept segment starts with an onset and ends its stream with EOS
    assert (rhythm[:, 0] == 1).all()
    for row in data:
        nz = row[row > 0]
        assert nz[-1] == performance_codec.EOS
    # tokens stay in the 342 vocab
    assert data.max() < 342 and data.min() >= 0


def test_corpus_feeds_training(midi_corpus):
    """End-to-end: real MIDI -> corpus -> dataset -> one jitted train step."""
    from music_fader_nets_tpu.config import ModelConfig
    from music_fader_nets_tpu import models
    from music_fader_nets_tpu.data.datasets import YamahaDataset
    from music_fader_nets_tpu.train import Trainer, vanilla_loss

    data, rhythm, nd, chroma = build_corpus(midi_corpus, n_workers=1)
    # pad tokens to fixed length for static shapes
    padded = np.zeros((len(data), 100), int)
    padded[:, : data.shape[1]] = data
    ds = YamahaDataset(padded, rhythm, nd, chroma, mode="train")
    cfg = ModelConfig(hidden_dims=32, z_dims=8, batch_size=2)
    tr = Trainer(cfg, models.init_reg_vae, {"default": vanilla_loss})
    m = tr.run_epoch(ds.arrays(), seed=0)
    assert np.isfinite(m["loss"])


def test_performance_quantize_half_step_rounds_up():
    """Magenta's quantize_to_step is int(sec*100 + 0.5): exact half-steps
    round UP. Python round() would bankers-round 12.5 -> 12 — and MIDI tick
    grids land on exact half-steps constantly (e.g. the 0.125 s grid of the
    synthetic corpus: 0.125*100 == 12.5 exactly)."""
    notes = [MidiNote(60, 80, 0.125, 0.375)]     # 12.5 -> 13, 37.5 -> 38
    toks = performance_codec.performance_encode(notes)
    # [shift(13), vel, on, shift(25), off] — shift covers the gap to the
    # event step, THEN the velocity event fires at that step
    assert toks == [performance_codec.SHIFT_BASE + 13 - 1,
                    performance_codec.VEL_BASE + 40 - 1,
                    performance_codec.NOTE_ON_BASE + 60 - 21,
                    performance_codec.SHIFT_BASE + 25 - 1,
                    performance_codec.NOTE_OFF_BASE + 60 - 21]
    # pure-Python path must agree bit for bit
    from music_fader_nets_tpu import native
    flag = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        assert performance_codec.performance_encode(notes) == toks
    finally:
        native.HAVE_NATIVE = flag


def test_performance_tiebreak_off_before_on_same_step():
    """At one quantized step, Magenta orders events by NOTE index (sorted by
    (start, pitch)): an earlier note's OFF precedes a later note's ON; a
    single note's ON precedes its own OFF."""
    notes = [MidiNote(60, 80, 0.0, 1.0), MidiNote(64, 80, 1.0, 2.0)]
    toks = performance_codec.performance_encode(notes)
    ON, OFF, SH = (performance_codec.NOTE_ON_BASE,
                   performance_codec.NOTE_OFF_BASE,
                   performance_codec.SHIFT_BASE)
    assert toks == [performance_codec.VEL_BASE + 40 - 1, ON + 39,
                    SH + 99, OFF + 39, ON + 43,     # off(60) BEFORE on(64)
                    SH + 99, OFF + 43]
    # zero-length note: forced to 1 step, ON then OFF of the SAME note in
    # index order (is_off breaks the tie within one note)
    toks2 = performance_codec.performance_encode(
        [MidiNote(72, 80, 0.5, 0.5)])
    assert toks2 == [SH + 49, performance_codec.VEL_BASE + 40 - 1, ON + 51,
                     SH + 0, OFF + 51]


def test_performance_velocity_bin_change_mid_chord():
    """Chord with different velocity bins: VEL re-emitted before each ON
    whose bin differs from the running bin, in pitch order."""
    notes = [MidiNote(60, 80, 0.0, 0.5), MidiNote(64, 20, 0.0, 0.5),
             MidiNote(67, 80, 0.0, 0.5)]
    toks = performance_codec.performance_encode(notes)
    ON = performance_codec.NOTE_ON_BASE
    v80 = performance_codec.VEL_BASE + 40 - 1     # bin(80) = 40
    v20 = performance_codec.VEL_BASE + 10 - 1     # bin(20) = 10
    assert toks[:6] == [v80, ON + 39, v20, ON + 43, v80, ON + 46]


def test_performance_long_gap_shift_splitting():
    """Gaps longer than 100 steps: max shifts then the remainder
    (Magenta emits MAX_SHIFT_STEPS chunks)."""
    notes = [MidiNote(60, 80, 0.0, 0.1), MidiNote(62, 80, 2.5, 2.6)]
    toks = performance_codec.performance_encode(notes)
    SH = performance_codec.SHIFT_BASE
    # [vel, on60, shift10, off60, | gap 240 -> 100+100+40 |, on62, ...]
    seg = toks[4:7]
    assert seg == [SH + 99, SH + 99, SH + 39]


def test_performance_codec_golden_stream():
    """Pinned token stream for a fixed note list — regression guard for the
    342-vocab encoder (velocity-bin changes, max-shift splitting, re-strike,
    simultaneous on/off ordering)."""
    notes = [
        MidiNote(60, 80, 0.00, 0.50),
        MidiNote(64, 90, 0.00, 0.25),
        MidiNote(67, 70, 0.30, 0.80),
        MidiNote(21, 127, 1.00, 2.50),
        MidiNote(108, 1, 1.00, 1.10),
        MidiNote(60, 80, 2.00, 2.20),   # re-strike
    ]
    golden = [317, 41, 322, 45, 202, 133, 182, 312, 48, 197, 129, 207, 136,
              197, 341, 2, 278, 89, 187, 177, 267, 317, 41, 197, 129, 207,
              90, 1]
    assert performance_codec.performance_encode(notes, add_eos=True) == golden
    # and with the native path forced off (pure Python must agree)
    from music_fader_nets_tpu import native
    flag = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        assert performance_codec.performance_encode(
            notes, add_eos=True) == golden
    finally:
        native.HAVE_NATIVE = flag
