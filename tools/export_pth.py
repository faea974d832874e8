#!/usr/bin/env python
"""Export a native checkpoint to the reference's .pth interchange format
(torch state_dict with layerN.M.convK/bnK naming, HWIO->OIHW transposes,
training_classes/label2human metadata — train_supervised.py:180-202), so
models trained by this framework load into the PyTorch reference unchanged.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_state_dict(variables, head):
    """Flax tree -> torch state_dict (inverse of utils/torch_import.py)."""
    import torch
    sd = {}
    params = variables["params"]
    stats = variables["batch_stats"]
    for blk, mods in params.items():
        layer, bi = blk.rsplit("_", 1)
        prefix = f"{layer}.{bi}"
        for mod, leaves in mods.items():
            if mod.startswith("conv"):
                w = np.asarray(leaves["kernel"]).transpose(3, 2, 0, 1)
                sd[f"{prefix}.{mod}.weight"] = torch.from_numpy(w.copy())
            elif mod.startswith("bn"):
                sd[f"{prefix}.{mod}.weight"] = torch.from_numpy(
                    np.asarray(leaves["scale"]).copy())
                sd[f"{prefix}.{mod}.bias"] = torch.from_numpy(
                    np.asarray(leaves["bias"]).copy())
                st = stats[blk][mod]
                sd[f"{prefix}.{mod}.running_mean"] = torch.from_numpy(
                    np.asarray(st["mean"]).copy())
                sd[f"{prefix}.{mod}.running_var"] = torch.from_numpy(
                    np.asarray(st["var"]).copy())
                sd[f"{prefix}.{mod}.num_batches_tracked"] = torch.tensor(0)
            elif mod == "ds_conv":
                w = np.asarray(leaves["kernel"]).transpose(3, 2, 0, 1)
                sd[f"{prefix}.downsample.0.weight"] = torch.from_numpy(w.copy())
            elif mod == "ds_bn":
                sd[f"{prefix}.downsample.1.weight"] = torch.from_numpy(
                    np.asarray(leaves["scale"]).copy())
                sd[f"{prefix}.downsample.1.bias"] = torch.from_numpy(
                    np.asarray(leaves["bias"]).copy())
                st = stats[blk]["ds_bn"]
                sd[f"{prefix}.downsample.1.running_mean"] = torch.from_numpy(
                    np.asarray(st["mean"]).copy())
                sd[f"{prefix}.downsample.1.running_var"] = torch.from_numpy(
                    np.asarray(st["var"]).copy())
                sd[f"{prefix}.downsample.1.num_batches_tracked"] = \
                    torch.tensor(0)
            elif mod == "se":
                for fc, tix in (("fc1", 0), ("fc2", 2)):
                    sd[f"{prefix}.se.fc.{tix}.weight"] = torch.from_numpy(
                        np.asarray(leaves[fc]["kernel"]).T.copy())
                    sd[f"{prefix}.se.fc.{tix}.bias"] = torch.from_numpy(
                        np.asarray(leaves[fc]["bias"]).copy())
    n = int(head.n_active)
    sd["classifier.weight"] = __import__("torch").from_numpy(
        np.asarray(head.weight)[:n].copy())
    if head.bias is not None:
        sd["classifier.bias"] = __import__("torch").from_numpy(
            np.asarray(head.bias)[:n].copy())
    return sd


def write_pth(variables, head, meta, out_path):
    """Write the reference's .pth interchange ckpt (train_supervised.py:
    180-202 keys), incl. the linear-mapping state_dict when present
    (reference learn_mapping.py:37-39: LinearMap keys map.weight/map.bias,
    the shape utils/torch_import.py:143-147 reads back)."""
    import torch
    sd = export_state_dict(variables, head)
    state = {"model": sd, "epoch": meta.get("epoch", 0)}
    if meta.get("training_classes") is not None:
        state["training_classes"] = meta["training_classes"]
    if meta.get("label2human") is not None:
        state["label2human"] = meta["label2human"]
    mapping = meta.get("mapping_linear_label2image")
    if mapping is not None:
        state["mapping_linear_label2image"] = {
            "map.weight": torch.from_numpy(
                np.asarray(mapping["weight"], np.float32).copy()),
            "map.bias": torch.from_numpy(
                np.asarray(mapping["bias"], np.float32).copy())}
    torch.save(state, out_path)


def main(argv=None):
    from subspace_reg_tpu.utils.checkpoint import load_any

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    variables, head, meta = load_any(args.ckpt)
    write_pth(variables, head, meta, args.out)
    print("exported", args.out)


if __name__ == "__main__":
    main()
