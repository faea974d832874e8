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


_unpack_cache: Dict[tuple, Any] = {}


def device_put_packed(tree, lanes: Optional[int] = None):
    """Upload a host pytree in ONE transfer per dtype.

    The chip sits behind a relay tunnel (~19MB/s, ~0.1s round-trip per
    transfer), so uploading a ~100-leaf checkpoint leaf-by-leaf costs tens
    of seconds of pure round-trip latency (measured: ~80s per checkpoint
    load inside the seed fan-out).  Packing every same-dtype leaf into one
    flat buffer makes the upload bandwidth-bound instead; the device-side
    slice/reshape ops dispatch asynchronously.

    ``lanes=S`` additionally broadcasts every leaf to ``(S,) + shape``
    INSIDE the same single unpack program — the seed fan-out's "upload one
    shared checkpoint, fan out S lanes on device" path.  (An eager
    per-leaf broadcast_to would dispatch ~200 tiny programs, each paying a
    ~2s remote compile through the relay — measured at 433s per group.)
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs = [np.asarray(x) for x in leaves]
    by_dtype: Dict[str, list] = {}
    for i, a in enumerate(arrs):
        by_dtype.setdefault(a.dtype.str, []).append(i)
    bufs = {dt: np.concatenate([arrs[i].ravel() for i in idxs])
            for dt, idxs in by_dtype.items()}
    # ONE jitted unpack program (cached per shape signature): eager
    # per-leaf slices would dispatch ~100 separate tiny programs, each
    # paying a remote compile on first sight (~2s each through the relay)
    sig = (tuple((a.shape, a.dtype.str) for a in arrs), lanes)
    fn = _unpack_cache.get(sig)
    if fn is None:
        def unpack(bufs_, _spec=sig[0], _groups=dict(by_dtype),
                   _lanes=lanes):
            out = [None] * len(_spec)
            for dt, idxs in _groups.items():
                off = 0
                for i in idxs:
                    shape, _ = _spec[i]
                    n = int(np.prod(shape, dtype=np.int64))
                    leaf = jax.lax.slice(
                        bufs_[dt], (off,), (off + n,)).reshape(shape)
                    if _lanes is not None:
                        leaf = jnp.broadcast_to(
                            leaf[None], (_lanes,) + shape)
                    out[i] = leaf
                    off += n
            return out
        fn = jax.jit(unpack)
        _unpack_cache[sig] = fn
    return jax.tree_util.tree_unflatten(treedef, fn(bufs))


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


def load_checkpoint(path: str, extra_template: Optional[Any] = None,
                    device: bool = True):
    """``device=False`` returns numpy leaves (callers that re-stack per-seed
    checkpoints upload once, packed, instead of per seed).  ``n_active`` is
    a host int either way — a device scalar there forces a blocking relay
    round-trip on every later ``int()``."""
    with open(path, "rb") as f:
        raw = pickle.load(f)
    tree = serialization.msgpack_restore(raw["msgpack"])
    packed = {"variables": tree["variables"],
              "head_weight": tree["head_weight"]}
    if raw["has_bias"]:
        packed["head_bias"] = tree["head_bias"]
    if device:
        packed = device_put_packed(packed)
    head = Head(weight=packed["head_weight"],
                bias=packed.get("head_bias"),
                n_active=int(tree["head_n_active"]))
    meta = dict(raw["meta"])
    if "extra" in tree:
        if extra_template is not None:
            meta["extra"] = serialization.from_state_dict(
                extra_template, tree["extra"])
        else:
            meta["extra"] = tree["extra"]
    return packed["variables"], head, meta


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
    packed = device_put_packed(
        {"variables": payload["variables"], "w": payload["head_weight"],
         **({"b": payload["head_bias"]} if raw["has_bias"] else {})})
    head = Head(weight=packed["w"], bias=packed.get("b"),
                n_active=int(payload["head_n_active"]))
    return packed["variables"], head, raw["meta"]


def load_any(path: str, max_classes: Optional[int] = None,
             device: bool = True):
    """Dispatch: reference .pth (torch pickle) or native checkpoint."""
    if path.endswith(".pth"):
        from .torch_import import import_checkpoint
        return import_checkpoint(path, max_classes=max_classes,
                                 device=device)
    # load on host, pad on host, then (optionally) one packed upload — the
    # padding branch must not trigger a device->host pull of freshly
    # uploaded weights
    variables, head, meta = load_checkpoint(path, device=False)
    if max_classes is not None and head.weight.shape[0] != max_classes:
        n = int(head.n_active)
        w = np.zeros((max_classes, head.weight.shape[1]), np.float32)
        w[:n] = np.asarray(head.weight)[:n]
        b = None
        if head.bias is not None:
            b = np.zeros((max_classes,), np.float32)
            b[:n] = np.asarray(head.bias)[:n]
        head = Head(weight=w, bias=b, n_active=n)
    if device:
        packed = {"v": variables, "w": head.weight,
                  **({} if head.bias is None else {"b": head.bias})}
        packed = device_put_packed(packed)
        variables = packed["v"]
        head = Head(weight=packed["w"], bias=packed.get("b"),
                    n_active=int(head.n_active))
    return variables, head, meta
