"""Pallas decode kernel: interpreter-mode equivalence with the XLA scan
(on CPU; the compiled kernel is exercised on real TPU by bench/verify)."""
import jax
import numpy as np

from music_fader_nets_tpu.models.modules import (
    global_decoder_greedy, global_decoder_init,
)
from music_fader_nets_tpu.ops.pallas_decode import (
    greedy_decode_tokens, pallas_greedy_decode,
)


def _sharp_gview(V=342, Z=280, H=64, key=0):
    p = global_decoder_init(jax.random.PRNGKey(key), Z, V, H)
    # sharpen the head so argmax is robust to reduction-order noise
    p["linear_out_g"]["w"] = p["linear_out_g"]["w"] * 8.0
    return p


def test_pallas_matches_scan_interpret():
    gv = _sharp_gview()
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 280))
    ref = np.argmax(np.asarray(global_decoder_greedy(gv, z, 25)), -1)
    got = np.asarray(pallas_greedy_decode(gv, z, 25, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_pallas_b1_transfer_shape():
    gv = _sharp_gview()
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 280))
    got = np.asarray(pallas_greedy_decode(gv, z, 40, interpret=True))
    assert got.shape == (1, 40)
    assert got.min() >= 0 and got.max() < 342


def test_greedy_decode_tokens_fallback():
    """On CPU without interpret, the compiled kernel path fails and the
    helper must silently fall back to the XLA scan."""
    gv = _sharp_gview()
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 280))
    ref = np.argmax(np.asarray(global_decoder_greedy(gv, z, 15)), -1)
    got = np.asarray(greedy_decode_tokens(gv, z, 15, use_pallas=True))
    np.testing.assert_array_equal(ref, got)


def test_large_batch_uses_scan():
    gv = _sharp_gview()
    z = jax.random.normal(jax.random.PRNGKey(4), (80, 280))   # > 64 cap
    got = np.asarray(greedy_decode_tokens(gv, z, 10))
    assert got.shape == (80, 10)
