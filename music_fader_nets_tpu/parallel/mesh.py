"""Device mesh + sharding layout.

The reference is single-process single-GPU with no distribution at all
(SURVEY.md §2.2); parallelism here is *introduced*, TPU-style: a
`jax.sharding.Mesh` with a `data` axis (batch / DP over ICI) and a `model`
axis (tensor parallelism over the GRU gate dimension). XLA's GSPMD inserts
the collectives (psum of gradients over `data`, all-gathers/reduce-scatters
around the sharded matmuls over `model`). At reference model scale a pure-DP
mesh is optimal — `make_mesh(n, 1)` — but the TP path is fully functional and
exercised by `__graft_entry__.dryrun_multichip`.

Layout rules:
  * batch tensors: first axis over `data`.
  * GRU weight matrices `w_ih`/`w_hh` `(I, 3H)` and their biases `(3H,)`:
    last axis over `model` — each TP shard holds a slice of all three gates
    and computes its slice of the gate math locally; the elementwise GRU
    recurrence never needs cross-shard traffic except the h broadcast, which
    GSPMD turns into an all-gather of the (small) hidden state.
  * everything else replicated.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# The mesh a train/eval step is being traced under. pallas_call cannot be
# GSPMD-partitioned, so ops that dispatch to Pallas kernels consult this at
# trace time to wrap the kernel in a shard_map over the `data` axis instead
# (ops/gru.py::stacked_gru_scan). Set by Trainer around its jitted bodies.
_TRACE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "music_fader_nets_trace_mesh", default=None)


@contextlib.contextmanager
def trace_mesh_scope(mesh: Optional[Mesh]):
    token = _TRACE_MESH.set(mesh)
    try:
        yield
    finally:
        _TRACE_MESH.reset(token)


def current_trace_mesh() -> Optional[Mesh]:
    return _TRACE_MESH.get()


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices")
    dev_array = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_pspec(path: tuple, leaf) -> P:
    """Partition rule for one parameter leaf, keyed by its pytree path."""
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    leaf_name = names[-1] if names else ""
    if leaf_name in ("w_ih", "w_hh") and leaf.ndim == 2:
        return P(None, MODEL_AXIS)
    if leaf_name in ("b_ih", "b_hh") and leaf.ndim == 1:
        return P(MODEL_AXIS)
    return P()


def param_pspecs(params):
    """Pytree of PartitionSpecs matching `params`."""
    return jax.tree_util.tree_map_with_path(_leaf_pspec, params)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _leaf_pspec(path, leaf)), params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh with the TP layout."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with the leading axis over `data`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
