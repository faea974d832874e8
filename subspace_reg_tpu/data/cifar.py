"""CIFAR-FS / FC100 loading (reference dataset/cifar.py:13-107).

Per-partition pickles with the sparse->dense label remap (:52-66).  The
reference never wires CIFAR into either entry point (eval_incremental.py:82-83
raises); this loader makes the data layer complete so the TPU engines can be
run on CIFAR-scale inputs (transform 'D', dropblock_size 2).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .mini_imagenet import SplitData, continual_split
from .pickles import load_pickle_latin1


def load_cifar(opt, partition: str = "train") -> SplitData:
    data = load_pickle_latin1(
        os.path.join(opt.data_root, f"{partition}.pickle"))
    imgs = data["data"]
    labels = data["labels"]

    # adjust sparse labels to labels from 0 to n (cifar.py:56-66)
    cur_class = 0
    label2label = {}
    for label in labels:
        if label not in label2label:
            label2label[label] = cur_class
            cur_class += 1
    new_labels = [label2label[label] for label in labels]

    n_classes = max(new_labels) + 1
    label2human = [f"class {i}" for i in range(n_classes)]
    if "catname2label" in data:
        inv = {}
        for k, v in data["catname2label"].items():
            if v in label2label:
                inv[label2label[v]] = str(k).lower().replace("_", " ")
        label2human = [inv.get(i, f"class {i}") for i in range(n_classes)]

    return SplitData(imgs=imgs, labels=new_labels, cat2label={},
                     label2human=label2human)


def load_cifar_continual(opt, split: str = "train",
                         phase: Optional[str] = None,
                         train_per_class: int = 400,
                         val_per_class: int = 50,
                         lazy: bool = False) -> SplitData:
    """Multi-session FSCIL protocol on CIFAR-100 — a capability the
    reference declares but never wires (eval_incremental.py:82-83 raises for
    CIFAR).  Reuses the miniImageNet continual split semantics (same 60/40
    class protocol, seeded identically) over an ``all.pickle`` with the
    standard {'data','labels','catname2label'} schema.  CIFAR-100 has 500
    train images per class, hence the 400/50/50 default partition."""
    np.random.seed(opt.set_seed)
    data = load_pickle_latin1(os.path.join(opt.data_root, "all.pickle"))
    imgs = data["data"]
    cat2label = dict(data.get("catname2label", {}))
    # lazy=True returns a LazyRows view over the shared pickle-cached
    # array (multi-seed fan-outs stage it on device once; see
    # data/mini_imagenet.py LazyRows)
    imgs, labels, cat2label, basec_map = continual_split(
        imgs, data["labels"], cat2label, split, phase,
        train_per_class, val_per_class, lazy=lazy)

    n_classes = 100
    label2human = [""] * n_classes
    labels_path = os.path.join(opt.data_root, "class_labels.txt")
    if os.path.exists(labels_path):
        with open(labels_path, "r") as f:
            for line in f.readlines():
                catname, humanname = line.strip().lower().split(" ")
                humanname = " ".join(humanname.split("_"))
                if catname in cat2label:
                    label2human[cat2label[catname]] = humanname
    else:
        for k, v in cat2label.items():
            label2human[v] = str(k).lower().replace("_", " ")
    return SplitData(imgs=imgs, labels=labels, cat2label=cat2label,
                     label2human=label2human, basec_map=basec_map)
