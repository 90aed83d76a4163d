"""Native C++ tokenizer kernels: bit-identical to the pure-Python paths.

Skipped when the extension isn't built (`python setup.py build_ext
--inplace`)."""
import numpy as np
import pytest

from music_fader_nets_tpu import native
from music_fader_nets_tpu.tokenizer import event_codec, performance_codec
from music_fader_nets_tpu.tokenizer.midi_io import MidiNote

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native extension not built")


def _random_notes(rng, n=50):
    notes = []
    t = 0.0
    for _ in range(n):
        t += float(rng.random() * 0.3)
        notes.append(MidiNote(int(rng.integers(21, 109)),
                              int(rng.integers(1, 128)),
                              t, t + float(rng.random() * 1.5) + 0.01))
    return notes


def _random_pr(rng, T=40):
    pr = np.zeros((T, 128), np.int64)
    for t in range(T):
        for p in rng.choice(np.arange(1, 128), size=rng.integers(0, 5),
                            replace=False):
            pr[t: t + int(rng.integers(1, 4)), p] = int(rng.integers(1, 128))
    return pr


def test_perf_encode_matches_python():
    rng = np.random.default_rng(0)
    for trial in range(10):
        notes = _random_notes(rng)
        import os
        os.environ["FADERNETS_NO_NATIVE"] = "0"
        got = performance_codec.performance_encode(notes, add_eos=True)
        # force the python path
        native_flag = native.HAVE_NATIVE
        try:
            native.HAVE_NATIVE = False
            ref = performance_codec.performance_encode(notes, add_eos=True)
        finally:
            native.HAVE_NATIVE = native_flag
        assert got == ref, f"trial {trial}"


def test_perf_decode_matches_python():
    rng = np.random.default_rng(1)
    toks = performance_codec.performance_encode(_random_notes(rng))
    got = performance_codec.performance_decode(toks)
    flag = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        ref = performance_codec.performance_decode(toks)
    finally:
        native.HAVE_NATIVE = flag
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert (a.pitch, a.velocity) == (b.pitch, b.velocity)
        assert abs(a.start - b.start) < 1e-9
        assert abs(a.end - b.end) < 1e-9


def test_event_codec_matches_python_and_roundtrips():
    rng = np.random.default_rng(2)
    for trial in range(10):
        pr = _random_pr(rng)
        ev_native = native.fadertok.pr_to_events(pr).tolist()
        pl, vl = event_codec.pianoroll_to_pitch_lists(pr)
        ev_py = event_codec.pitch_lists_to_events(pl, vl)
        assert ev_native == ev_py, f"trial {trial}"
        back = native.fadertok.events_to_pr(np.asarray(ev_native, np.int64))
        out = np.zeros_like(pr)
        out[: back.shape[0]] = back[: pr.shape[0]]
        np.testing.assert_array_equal(pr, out)


def test_rhythm_vectorized_matches_listwise():
    rng = np.random.default_rng(3)
    for _ in range(10):
        pr = _random_pr(rng)
        pl, _ = event_codec.pianoroll_to_pitch_lists(pr)
        ref = event_codec.pitch_lists_to_rhythm(pl)
        got = event_codec.rhythm_from_pianoroll(pr)
        assert ref == got


def test_native_speedup():
    """The native path should beat pure Python comfortably on a large roll.
    Best-of-3 timings: single-shot wall times flake under CPU contention."""
    import time
    rng = np.random.default_rng(4)
    notes = _random_notes(rng, n=3000)

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    t_native, toks = best_of(
        lambda: performance_codec.performance_encode(notes))
    flag = native.HAVE_NATIVE
    try:
        native.HAVE_NATIVE = False
        t_py, _ = best_of(
            lambda: performance_codec.performance_encode(notes))
    finally:
        native.HAVE_NATIVE = flag
    assert len(toks) > 3000
    assert t_native < t_py
