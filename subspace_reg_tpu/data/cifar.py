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

from .mini_imagenet import SplitData
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
