"""Numerical parity of GRU/linear primitives against torch (CPU).

These tests pin the exact cell math and weight layout that the `.pt`
checkpoint converter relies on (PyTorch r,z,n gate order, transposed
storage)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from music_fader_nets_tpu.ops.gru import (
    bigru_final_state, gru_cell, gru_scan, linear_apply,
)
from music_fader_nets_tpu.ops.sampling import argmax_one_hot, grad_reverse


def _torch_gru_params_to_jax(cell_or_gru, suffix=""):
    return {
        "w_ih": jnp.asarray(getattr(cell_or_gru, f"weight_ih{suffix}").detach().numpy().T),
        "w_hh": jnp.asarray(getattr(cell_or_gru, f"weight_hh{suffix}").detach().numpy().T),
        "b_ih": jnp.asarray(getattr(cell_or_gru, f"bias_ih{suffix}").detach().numpy()),
        "b_hh": jnp.asarray(getattr(cell_or_gru, f"bias_hh{suffix}").detach().numpy()),
    }


def test_gru_cell_matches_torch():
    torch.manual_seed(0)
    cell = torch.nn.GRUCell(12, 24)
    x = torch.randn(5, 12)
    h = torch.randn(5, 24)
    ref = cell(x, h).detach().numpy()

    p = _torch_gru_params_to_jax(cell)
    got = gru_cell(p, jnp.asarray(x.numpy()), jnp.asarray(h.numpy()))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_gru_scan_matches_torch_gru():
    torch.manual_seed(1)
    gru = torch.nn.GRU(10, 16, batch_first=True)
    x = torch.randn(4, 7, 10)
    out_ref, h_ref = gru(x)

    p = _torch_gru_params_to_jax(gru, "_l0")
    outs, h = gru_scan(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(outs, out_ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(h, h_ref[0].detach().numpy(), atol=1e-5)


def test_bigru_final_state_matches_torch_packing():
    """Validates the [fwd_final, bwd_final] concat order used by the
    reference's transpose/view (model_v2.py:83-85)."""
    torch.manual_seed(2)
    gru = torch.nn.GRU(8, 12, batch_first=True, bidirectional=True)
    x = torch.randn(3, 6, 8)
    h_n = gru(x)[-1]                                   # (2, B, H)
    ref = h_n.transpose(0, 1).contiguous().view(3, -1).detach().numpy()

    p_f = _torch_gru_params_to_jax(gru, "_l0")
    p_b = _torch_gru_params_to_jax(gru, "_l0_reverse")
    got = bigru_final_state(p_f, p_b, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_linear_matches_torch():
    torch.manual_seed(3)
    lin = torch.nn.Linear(9, 4)
    x = torch.randn(5, 9)
    ref = lin(x).detach().numpy()
    p = {"w": jnp.asarray(lin.weight.detach().numpy().T),
         "b": jnp.asarray(lin.bias.detach().numpy())}
    np.testing.assert_allclose(linear_apply(p, jnp.asarray(x.numpy())), ref,
                               atol=1e-5)


def test_argmax_one_hot():
    logits = jnp.array([[0.1, 2.0, -1.0], [3.0, 0.0, 0.0]])
    oh = argmax_one_hot(logits)
    np.testing.assert_array_equal(np.argmax(oh, -1), [1, 0])
    np.testing.assert_allclose(oh.sum(-1), 1.0)


def test_grad_reverse():
    f = lambda x: jnp.sum(grad_reverse(x) ** 2)
    x = jnp.array([1.0, -2.0])
    g = jax.grad(f)(x)
    np.testing.assert_allclose(g, -2.0 * x)          # reversed gradient
    np.testing.assert_allclose(grad_reverse(x), x)   # identity forward
