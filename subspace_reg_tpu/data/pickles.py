"""Low-level readers for the reference's on-disk formats."""

from __future__ import annotations

import pickle


def load_pickle_latin1(path: str):
    """The reference loads its dataset pickles with latin1 decoding
    (dataset/mini_imagenet.py:62, dataset/cifar.py:53)."""
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def load_labels_pkl(path: str):
    """tieredImageNet label pickles, with the latin1 fallback the reference
    uses (dataset/tiered_imagenet.py:110-121)."""
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        with open(path, "rb") as f:
            u = pickle._Unpickler(f)
            u.encoding = "latin1"
            return u.load()
