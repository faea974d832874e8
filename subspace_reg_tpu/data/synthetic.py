"""Synthetic dataset assets in the reference's on-disk formats.

Generates a miniature ``all.pickle`` + ``class_labels.txt`` (+ word-embed
pickles) so the full FSCIL pipeline runs end-to-end without the real
miniImageNet dump.  Formats match dataset/mini_imagenet.py:52-65,127-136 and
word_embeds/miniImageNet_dim500.pickle.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def make_mini_imagenet(root: str, n_classes: int = 100, per_class: int = 20,
                       img_size: int = 84, seed: int = 0) -> None:
    os.makedirs(root, exist_ok=True)
    r = np.random.RandomState(seed)
    n = n_classes * per_class
    labels = np.repeat(np.arange(n_classes), per_class)
    # images carry a class-dependent mean so models can actually learn
    base_colors = r.randint(30, 226, size=(n_classes, 3))
    imgs = (base_colors[labels][:, None, None, :]
            + r.randint(-25, 26, size=(n, img_size, img_size, 3)))
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    catname2label = {f"n{900000 + i:08d}": i for i in range(n_classes)}
    with open(os.path.join(root, "all.pickle"), "wb") as f:
        pickle.dump({"data": imgs, "labels": labels.tolist(),
                     "catname2label": catname2label}, f)
    with open(os.path.join(root, "class_labels.txt"), "w") as f:
        for cat, lbl in catname2label.items():
            f.write(f"{cat} synthetic_{lbl}\n")


def make_word_embeds(path: str, dataset: str = "miniImageNet",
                     dim: int = 500, n_classes: int = 100,
                     seed: int = 1) -> str:
    """Word-embedding pickle: {word: np.ndarray(dim)} covering the synthetic
    vocabulary ('synthetic', '<i>')."""
    os.makedirs(path, exist_ok=True)
    r = np.random.RandomState(seed)
    words = {"synthetic": r.randn(dim)}
    for i in range(n_classes):
        words[str(i)] = r.randn(dim)
    out = os.path.join(path, f"{dataset}_dim{dim}.pickle")
    with open(out, "wb") as f:
        pickle.dump(words, f)
    return out
