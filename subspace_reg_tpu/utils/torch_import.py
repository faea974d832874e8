"""PyTorch .pth checkpoint importer.

The reference's interchange format is a torch-pickled dict
(train_supervised.py:180-202):
    {'epoch'|'opt', 'model': state_dict,
     'training_classes': basec_map, 'label2human': [...],
     optionally 'mapping_linear_label2image': LinearMap state_dict}

This module converts a reference state_dict into the Flax variable tree of
``models.resnet.ResNetRFS`` plus a padded ``Head``.  torch (CPU) is used only
as a pickle decoder — no torch compute happens anywhere in the framework.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.head import Head


def load_pth(path: str) -> Dict[str, Any]:
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt


def state_dict_to_numpy(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            # copy: .numpy() aliases torch storage, which BN mutates in place
            out[k] = np.array(v.detach().cpu().numpy())
        else:
            out[k] = np.array(v)
    return out


def import_backbone(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map torch keys (layerL.B.convK.weight, bnK.*, downsample.{0,1}.*,
    se.fc.{0,2}.*) onto the Flax tree of ResNetRFS.

    Torch convs are OIHW; Flax convs are HWIO.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def pdict(tree, blk, mod):
        return tree.setdefault(blk, {}).setdefault(mod, {})

    for key, v in sd.items():
        parts = key.split(".")
        if parts[0] == "classifier" or parts[0] in ("avgpool", "dropout"):
            continue
        if not parts[0].startswith("layer"):
            continue
        blk = f"{parts[0]}_{parts[1]}"
        rest = parts[2:]
        mod = rest[0]
        if mod.startswith("conv"):
            pdict(params, blk, mod)["kernel"] = np.asarray(
                v.transpose(2, 3, 1, 0), jnp.float32)
        elif mod.startswith("bn"):
            attr = rest[1]
            if attr == "weight":
                pdict(params, blk, mod)["scale"] = np.asarray(v, jnp.float32)
            elif attr == "bias":
                pdict(params, blk, mod)["bias"] = np.asarray(v, jnp.float32)
            elif attr == "running_mean":
                pdict(stats, blk, mod)["mean"] = np.asarray(v, jnp.float32)
            elif attr == "running_var":
                pdict(stats, blk, mod)["var"] = np.asarray(v, jnp.float32)
            # num_batches_tracked intentionally dropped (torch-internal)
        elif mod == "downsample":
            if rest[1] == "0":  # 1x1 conv
                pdict(params, blk, "ds_conv")["kernel"] = np.asarray(
                    v.transpose(2, 3, 1, 0), jnp.float32)
            else:               # BN
                attr = rest[2]
                if attr == "weight":
                    pdict(params, blk, "ds_bn")["scale"] = np.asarray(v, jnp.float32)
                elif attr == "bias":
                    pdict(params, blk, "ds_bn")["bias"] = np.asarray(v, jnp.float32)
                elif attr == "running_mean":
                    pdict(stats, blk, "ds_bn")["mean"] = np.asarray(v, jnp.float32)
                elif attr == "running_var":
                    pdict(stats, blk, "ds_bn")["var"] = np.asarray(v, jnp.float32)
        elif mod == "se":
            fc = "fc1" if rest[2] == "0" else "fc2"
            attr = rest[3]
            sub = pdict(params, blk, "se").setdefault(fc, {})
            if attr == "weight":
                sub["kernel"] = np.asarray(v.T, jnp.float32)
            else:
                sub["bias"] = np.asarray(v, jnp.float32)
        # anything else (vocab classifier remnants) is ignored
    return {"params": params, "batch_stats": stats}


def import_head(sd: Dict[str, np.ndarray],
                max_classes: Optional[int] = None) -> Head:
    w = np.asarray(sd["classifier.weight"], np.float32)
    b = sd.get("classifier.bias")
    n_cls, in_dim = w.shape
    max_classes = max_classes or n_cls
    weight = np.zeros((max_classes, in_dim), np.float32)
    weight[:n_cls] = w
    bias = None
    if b is not None:
        bias = np.zeros((max_classes,), np.float32)
        bias[:n_cls] = np.asarray(b, np.float32)
    return Head(weight=weight, bias=bias, n_active=n_cls)


def import_checkpoint(path: str, max_classes: Optional[int] = None,
                      device: bool = True):
    """Load a reference .pth; returns (variables, head, meta dict).

    Construction is all-numpy; ``device=True`` then uploads the whole tree
    in one packed transfer (see checkpoint.device_put_packed — leaf-by-leaf
    uploads through the relay tunnel pay ~0.1s round-trip each).
    """
    ckpt = load_pth(path)
    sd = state_dict_to_numpy(ckpt["model"])
    variables = import_backbone(sd)
    head = import_head(sd, max_classes=max_classes)
    if device:
        from .checkpoint import device_put_packed
        packed = {"v": variables, "w": head.weight,
                  **({} if head.bias is None else {"b": head.bias})}
        packed = device_put_packed(packed)
        variables = packed["v"]
        head = Head(weight=packed["w"], bias=packed.get("b"),
                    n_active=int(head.n_active))
    meta = {
        "training_classes": ckpt.get("training_classes"),
        "label2human": ckpt.get("label2human"),
        "epoch": ckpt.get("epoch"),
        "has_bias": "classifier.bias" in sd,
    }
    if "mapping_linear_label2image" in ckpt:
        msd = state_dict_to_numpy(ckpt["mapping_linear_label2image"])
        meta["mapping_linear_label2image"] = {
            "weight": msd["map.weight"], "bias": msd["map.bias"]}
    return variables, head, meta
