"""Fused-frontend forward for pretraining: stages 1-2 through the Pallas
fused BasicBlocks (ops/fused_block.py), stages 3-4 through the Flax modules.

This is the hot-path alternative to ``ResNetRFS.__call__`` for the
supervised-pretraining step (reference hot loop train_supervised.py:216-244).
Semantics match the module path:

  * train-mode BN batch statistics + torch running-stat EMA (momentum 0.1,
    unbiased update) for the fused BNs, applied here since the fused path
    bypasses the ``TorchBatchNorm`` variable machinery,
  * per-block dropout after the pooled tail (stages 1/2 use plain
    ``nn.Dropout`` — the reference's drop_block flag is False there,
    models/resnet_language.py:119-122),
  * ``counters`` increment per block per forward,
  * stages 3/4 (+DropBlock, avg-pool) run unchanged via a partial apply of
    the Flax module, so their numerics and variable handling are identical
    to the unfused path.

Only valid for the geometry it is built for — ``can_fuse`` gates it:
single-block stages 1/2 (resnet12/18 family), no SE, bf16 compute, even
spatial dims, train mode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import fused_block as fb
from ..ops.pallas import conv_fused as cf


def can_fuse(backbone, img_size: int, train: bool) -> bool:
    try:
        nb = tuple(backbone.n_blocks)
        return (train
                and backbone.dtype == jnp.bfloat16
                and not backbone.use_se
                and len(nb) == 4 and nb[0] == 1 and nb[1] == 1
                and img_size % 4 == 0)
    except Exception:
        return False


def _running_update(bs: Dict[str, Any], stats: fb.BlockStats, n: int,
                    momentum: float = 0.1) -> Dict[str, Any]:
    """Torch running-stat EMA for one fused block's four BNs
    (models/layers.py TorchBatchNorm: biased batch var normalizes, the
    UNBIASED estimate feeds the running var)."""
    out = dict(bs)
    corr = n / max(n - 1.0, 1.0)
    for name, (m, v) in zip(("bn1", "bn2", "bn3", "ds_bn"),
                            (stats.bn1, stats.bn2, stats.bn3, stats.ds_bn)):
        out[name] = {
            "mean": (1.0 - momentum) * bs[name]["mean"] + momentum * m,
            "var": (1.0 - momentum) * bs[name]["var"] + momentum * (v * corr),
        }
    return out


def _dropout(rng, x, rate: float):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / jnp.asarray(keep, x.dtype),
                     jnp.zeros_like(x))


def fused_forward(backbone, variables: Dict[str, Any], x: jax.Array,
                  rng: Optional[jax.Array] = None,
                  interpret: Optional[bool] = None,
                  backend: str = "xla"
                  ) -> Tuple[jax.Array, Dict[str, Any]]:
    """Train-mode forward with fused stages 1-2.

    Returns (features, mutated) where mutated = {"batch_stats", "counters"}
    mirrors ``backbone.apply(..., mutable=[...])``'s second output.
    """
    if interpret is None:
        # Mosaic kernels need the TPU backend; everywhere else (the CPU
        # test mesh) runs the interpreter
        interpret = jax.default_backend() != "tpu"
    params = variables["params"]
    bstats = variables["batch_stats"]
    counters = variables["counters"]
    B, H, W, _ = x.shape
    drop = backbone.drop_rate

    r1 = r2 = r34 = None
    if rng is not None:
        r1, r2, r34 = jax.random.split(rng, 3)

    # ---- stage 1 (image entry, no dx) -----------------------------------
    out1, st1 = fb.fused_block_apply(x.astype(jnp.bfloat16),
                                     params["layer1_0"],
                                     paired_out=True, need_dx=False,
                                     interpret=interpret, backend=backend)
    n1 = B * H * W
    if drop > 0:
        out1 = _dropout(r1, out1, drop)

    # ---- stage 2 (paired in, flat out for the XLA stages) ---------------
    out2, st2 = fb.fused_block_apply(out1, params["layer2_0"],
                                     paired_in=True, paired_out=False,
                                     need_dx=True, interpret=interpret,
                                     backend=backend)
    n2 = n1 // 4
    if drop > 0:
        out2 = _dropout(r2, out2, drop)

    # ---- stages 3/4 + pooling via the Flax module -----------------------
    def tail(mod, xx, train):
        for blocks in mod.stages[2:]:
            for block in blocks:
                xx = block(xx, train, None)
        if mod.avg_pool:
            xx = jnp.mean(xx.astype(jnp.float32), axis=(1, 2))
        else:
            xx = xx.reshape(xx.shape[0], -1).astype(jnp.float32)
        return xx

    feat, mut = backbone.apply(
        {"params": params, "batch_stats": bstats, "counters": counters},
        out2, True, method=tail,
        mutable=["batch_stats", "counters"],
        rngs={"dropout": r34} if r34 is not None else {})

    new_bs = dict(mut["batch_stats"])
    new_bs["layer1_0"] = _running_update(bstats["layer1_0"], st1, n1)
    new_bs["layer2_0"] = _running_update(bstats["layer2_0"], st2, n2)

    new_counters = dict(mut["counters"])
    for lname in ("layer1_0", "layer2_0"):
        c = counters[lname]["num_batches_tracked"]
        new_counters[lname] = {"num_batches_tracked": c + 1}

    return feat, {"batch_stats": new_bs, "counters": new_counters}
