"""Checkpointing: Orbax for native state, and a bidirectional converter for
the reference's released PyTorch `.pt` state_dicts.

The reference checkpoints per epoch with `torch.save(model.cpu().state_dict())`
and resumes at import if the file exists (reference trainer.py:43-45,
267-277) — without optimizer state or step counter. The native path here
saves params + opt_state + step (so resume continues annealing, unlike the
reference quirk); the converter bridges to/from torch layer naming:

  torch `layer.weight (O,I)`            <-> params[layer]['w'] (I,O)
  torch `gru.weight_ih_l0 (3H,I)`       <-> params[gru]['fwd']['w_ih'] (I,3H)
  torch `gru.weight_ih_l0_reverse`      <-> params[gru]['bwd']['w_ih']
  torch `grucell.weight_ih (3H,I)`      <-> params[grucell]['w_ih'] (I,3H)
  torch `emb_lookup.weight (K,D)`       <-> params['emb_lookup'] (K,D)

Gate order (r,z,n) is already PyTorch's, so conversion is pure
transpose/rename (validated against torch in tests/test_ops.py).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (e.g. TrainState) to `path` (overwrites)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by `save_checkpoint`; `template` provides
    structure/shapes/dtypes."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))


# ---------------------------------------------------------------------------
# torch <-> params conversion
# ---------------------------------------------------------------------------

_GRU_SUFFIXES = ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
_CELL_SUFFIXES = ("weight_ih", "weight_hh", "bias_ih", "bias_hh")


def _to_np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_state_dict(sd: Dict[str, Any],
                             dtype=jnp.float32) -> Dict:
    """Reference-named torch state_dict -> our param pytree.

    Works for every model family because parameter names match the reference
    modules 1:1 (models/vae.py, models/gmvae.py). Unknown keys raise."""
    params: Dict[str, Any] = {}

    def put(layer, leaf, value):
        params.setdefault(layer, {})[leaf] = jnp.asarray(value, dtype)

    for key, tensor in sd.items():
        t = _to_np(tensor)
        if "." not in key:
            raise ValueError(f"unexpected flat key {key!r}")
        layer, leaf = key.split(".", 1)
        if leaf in ("weight", "bias") and layer.endswith("_lookup"):
            # nn.Embedding tables (gmm_model.py:157-183): stored directly
            params[layer] = jnp.asarray(t, dtype)
        elif leaf == "weight":
            put(layer, "w", t.T)
        elif leaf == "bias":
            put(layer, "b", t)
        elif leaf in _GRU_SUFFIXES:                       # bi/uni nn.GRU fwd
            kind = leaf.split("_l0")[0]
            dest = params.setdefault(layer, {})
            is_bigru = any(k.endswith("_reverse") for k in sd
                           if k.startswith(layer + "."))
            sub = dest.setdefault("fwd", {}) if is_bigru else dest
            sub[_torch_gru_leaf(kind)] = jnp.asarray(
                t.T if kind.startswith("weight") else t, dtype)
        elif leaf.endswith("_reverse") and leaf.split("_l0")[0] in (
                "weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            kind = leaf.split("_l0")[0]
            sub = params.setdefault(layer, {}).setdefault("bwd", {})
            sub[_torch_gru_leaf(kind)] = jnp.asarray(
                t.T if kind.startswith("weight") else t, dtype)
        elif leaf in _CELL_SUFFIXES:                      # nn.GRUCell
            put(layer, _torch_gru_leaf(leaf),
                t.T if leaf.startswith("weight") else t)
        else:
            raise ValueError(f"unrecognized state_dict key {key!r}")
    return params


def _torch_gru_leaf(kind: str) -> str:
    return {"weight_ih": "w_ih", "weight_hh": "w_hh",
            "bias_ih": "b_ih", "bias_hh": "b_hh"}[kind]


def params_to_torch_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """Our param pytree -> reference-named numpy state_dict (for exporting
    trained weights back to the PyTorch ecosystem)."""
    sd: Dict[str, np.ndarray] = {}
    for layer, val in params.items():
        if isinstance(val, (jnp.ndarray, np.ndarray)) or hasattr(val, "shape"):
            sd[f"{layer}.weight"] = np.asarray(val)       # embedding table
            continue
        if set(val.keys()) == {"fwd", "bwd"}:             # bidirectional GRU
            for d, suffix in (("fwd", ""), ("bwd", "_reverse")):
                for ours, theirs in (("w_ih", "weight_ih_l0"),
                                     ("w_hh", "weight_hh_l0"),
                                     ("b_ih", "bias_ih_l0"),
                                     ("b_hh", "bias_hh_l0")):
                    arr = np.asarray(val[d][ours])
                    if ours.startswith("w"):
                        arr = arr.T
                    sd[f"{layer}.{theirs}{suffix}"] = arr
        elif set(val.keys()) == {"w_ih", "w_hh", "b_ih", "b_hh"}:
            # plain GRU layer or GRUCell: reference uses nn.GRU for the
            # sub-decoders (-> _l0 names) and nn.GRUCell for the global
            # decoder (-> bare names)
            is_cell = layer.startswith("grucell")
            for ours, base in (("w_ih", "weight_ih"), ("w_hh", "weight_hh"),
                               ("b_ih", "bias_ih"), ("b_hh", "bias_hh")):
                name = base if is_cell else base + "_l0"
                arr = np.asarray(val[ours])
                if ours.startswith("w"):
                    arr = arr.T
                sd[f"{layer}.{name}"] = arr
        elif set(val.keys()) == {"w", "b"}:
            sd[f"{layer}.weight"] = np.asarray(val["w"]).T
            sd[f"{layer}.bias"] = np.asarray(val["b"])
        else:
            raise ValueError(f"unrecognized param group {layer!r}")
    return sd


def load_pt_checkpoint(path: str, dtype=jnp.float32) -> Dict:
    """Load a released reference `.pt` file into a param pytree."""
    import torch
    sd = torch.load(path, map_location="cpu")
    return convert_torch_state_dict(sd, dtype)
