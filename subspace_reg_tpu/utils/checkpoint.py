"""Native checkpointing (msgpack via flax.serialization) with the reference's
metadata contract (training_classes / label2human — train_supervised.py:180-202),
plus orbax-based directory checkpoints for large-scale runs.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models.head import Head


def save_checkpoint(path: str, variables: Dict[str, Any], head: Head,
                    meta: Optional[Dict[str, Any]] = None,
                    extra: Optional[Any] = None) -> None:
    """``extra`` may carry any additional array pytree (e.g. optimizer state
    + step for mid-run resume — a capability the reference lacks: it saves
    model weights only, train_supervised.py:180-202, and its --reload_path
    flag is declared but never consumed, configs.py:149)."""
    payload = {
        "variables": jax.tree_util.tree_map(np.asarray, variables),
        "head": {
            "weight": np.asarray(head.weight),
            "bias": None if head.bias is None else np.asarray(head.bias),
            "n_active": int(head.n_active),
        },
        "meta": meta or {},
    }
    blob_tree = {
        "variables": payload["variables"],
        "head_weight": payload["head"]["weight"],
        "head_bias": (payload["head"]["bias"]
                      if payload["head"]["bias"] is not None
                      else np.zeros((0,), np.float32)),
        "head_n_active": np.asarray(payload["head"]["n_active"]),
    }
    if extra is not None:
        blob_tree["extra"] = serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, extra))
    blob = serialization.msgpack_serialize(blob_tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"msgpack": blob, "meta": payload["meta"],
                     "has_bias": head.bias is not None}, f)


def load_checkpoint(path: str, extra_template: Optional[Any] = None):
    with open(path, "rb") as f:
        raw = pickle.load(f)
    tree = serialization.msgpack_restore(raw["msgpack"])
    variables = jax.tree_util.tree_map(jnp.asarray, tree["variables"])
    bias = jnp.asarray(tree["head_bias"]) if raw["has_bias"] else None
    head = Head(weight=jnp.asarray(tree["head_weight"]), bias=bias,
                n_active=jnp.asarray(int(tree["head_n_active"]), jnp.int32))
    meta = dict(raw["meta"])
    if "extra" in tree:
        if extra_template is not None:
            meta["extra"] = serialization.from_state_dict(
                extra_template, tree["extra"])
        else:
            meta["extra"] = tree["extra"]
    return variables, head, meta


def save_orbax(dirpath: str, variables: Dict[str, Any], head: Head,
               meta: Optional[Dict[str, Any]] = None) -> None:
    """Directory checkpoint via orbax (for large-scale sharded runs)."""
    import orbax.checkpoint as ocp
    payload = {
        "variables": jax.tree_util.tree_map(np.asarray, variables),
        "head_weight": np.asarray(head.weight),
        "head_bias": (np.asarray(head.bias) if head.bias is not None
                      else np.zeros((1,), np.float32)),   # orbax rejects 0-size
        "head_n_active": np.asarray(int(head.n_active)),
    }
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(dirpath)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.pkl"), "wb") as f:
        pickle.dump({"meta": meta or {},
                     "has_bias": head.bias is not None}, f)


def load_orbax(dirpath: str):
    import orbax.checkpoint as ocp
    path = os.path.abspath(dirpath)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    with open(os.path.join(path, "meta.pkl"), "rb") as f:
        raw = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, payload["variables"])
    bias = (jnp.asarray(payload["head_bias"]) if raw["has_bias"] else None)
    head = Head(weight=jnp.asarray(payload["head_weight"]), bias=bias,
                n_active=jnp.asarray(int(payload["head_n_active"]),
                                     jnp.int32))
    return variables, head, raw["meta"]


def load_any(path: str, max_classes: Optional[int] = None):
    """Dispatch: reference .pth (torch pickle) or native checkpoint."""
    if path.endswith(".pth"):
        from .torch_import import import_checkpoint
        return import_checkpoint(path, max_classes=max_classes)
    variables, head, meta = load_checkpoint(path)
    if max_classes is not None and head.weight.shape[0] != max_classes:
        n = int(head.n_active)
        w = np.zeros((max_classes, head.weight.shape[1]), np.float32)
        w[:n] = np.asarray(head.weight)[:n]
        b = None
        if head.bias is not None:
            b = np.zeros((max_classes,), np.float32)
            b[:n] = np.asarray(head.bias)[:n]
        head = Head(weight=jnp.asarray(w),
                    bias=jnp.asarray(b) if b is not None else None,
                    n_active=jnp.asarray(n, jnp.int32))
    return variables, head, meta
