"""Audio preview renderer tests (host-only, no device work).

The reference previews transfer output via pyfluidsynth
(`arousal_transfer.ipynb` cell 2); ours is a dependency-free NumPy synth
writing stdlib WAV — these tests pin its contract.
"""
import wave

import numpy as np

from music_fader_nets_tpu.tokenizer.midi_io import MidiNote
from music_fader_nets_tpu.transfer.audio import (
    notes_to_wav, render_notes, write_wav,
)


def _chord():
    return [
        MidiNote(pitch=60, velocity=80, start=0.0, end=0.5),
        MidiNote(pitch=64, velocity=90, start=0.25, end=0.75),
        MidiNote(pitch=67, velocity=100, start=0.5, end=1.0),
    ]


def test_render_basic_properties():
    audio = render_notes(_chord(), sample_rate=8000)
    assert audio.dtype == np.float32
    # covers last note end + release tail
    assert audio.size >= int(1.0 * 8000)
    assert np.abs(audio).max() <= 0.85 + 1e-6
    assert np.abs(audio).max() > 0.01          # actually made sound
    assert np.isfinite(audio).all()


def test_render_is_deterministic_and_velocity_scales():
    a1 = render_notes(_chord(), sample_rate=8000)
    a2 = render_notes(_chord(), sample_rate=8000)
    np.testing.assert_array_equal(a1, a2)
    loud = render_notes([MidiNote(60, 120, 0.0, 0.5)], sample_rate=8000)
    soft = render_notes([MidiNote(60, 30, 0.0, 0.5)], sample_rate=8000)
    assert np.abs(loud).max() > np.abs(soft).max()


def test_render_empty_and_degenerate_notes():
    assert render_notes([], sample_rate=8000).size > 0
    # zero-length / out-of-range / negative-start notes are dropped,
    # not crashed on
    audio = render_notes([MidiNote(60, 80, 1.0, 1.0),
                          MidiNote(200, 80, 0.0, 0.5),
                          MidiNote(60, 80, -0.5, 0.2)], sample_rate=8000)
    assert np.abs(audio).max() == 0.0


def test_high_pitch_drops_aliased_harmonics():
    # G9 fundamental 12.5 kHz: at sr=8000 every harmonic is past Nyquist
    audio = render_notes([MidiNote(127, 100, 0.0, 0.3)], sample_rate=8000)
    assert np.abs(audio).max() == 0.0
    # but survives at a high sample rate
    audio = render_notes([MidiNote(127, 100, 0.0, 0.3)], sample_rate=44100)
    assert np.abs(audio).max() > 0.0


def test_wav_round_trip(tmp_path):
    path = str(tmp_path / "preview.wav")
    audio = notes_to_wav(_chord(), path, sample_rate=8000)
    with wave.open(path, "rb") as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getframerate() == 8000
        assert w.getnframes() == audio.size
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    np.testing.assert_allclose(pcm / 32767.0, audio, atol=1.0 / 32767)


def test_write_wav_clips_out_of_range(tmp_path):
    path = str(tmp_path / "clip.wav")
    write_wav(path, np.array([2.0, -2.0, 0.0]), sample_rate=8000)
    with wave.open(path, "rb") as w:
        pcm = np.frombuffer(w.readframes(3), dtype="<i2")
    assert pcm[0] == 32767 and pcm[1] == -32767 and pcm[2] == 0
