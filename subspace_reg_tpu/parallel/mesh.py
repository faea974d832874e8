"""Device mesh + sharding helpers.

The reference's only multi-device path is single-process ``nn.DataParallel``
for pretraining (train_supervised.py:141-142).  The TPU-native equivalent is
a 2-D ``('data', 'model')`` mesh:

  * ``data``  — batch sharding; XLA turns BN batch statistics and the
    gradient reduction into ICI collectives (psum) automatically under jit
    with sharding annotations (cross-replica BN — stronger than the
    reference's DataParallel, which silently keeps replica-0 BN stats).
  * ``model`` — optional tensor sharding of the classifier head (the only
    layer whose width grows with the class count); everything else is
    replicated — at this model scale TP is demonstrative, DP is the win.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: Optional[int] = None, n_model: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model <= n_total, (
        f"mesh {n_data}x{n_model} exceeds {n_total} devices")
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def head_sharding(mesh: Mesh) -> NamedSharding:
    """Classifier rows sharded over the model axis (class-parallel)."""
    return NamedSharding(mesh, P("model", None))


def shard_batch(mesh: Mesh, *arrays):
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), tree)
