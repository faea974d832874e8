"""Model factory (reference models/util.py:6-35 dispatch semantics).

``create_model`` returns the Flax backbone module; the classifier head is a
separate padded buffer (see models/head.py), created by the caller with
``init_head`` or imported from a .pth checkpoint.
"""

from __future__ import annotations

from . import model_dict
from .resnet import ResNetRFS


def create_model(name: str, n_cls: int, opt, vocab=None,
                 dataset: str = "miniImageNet", dtype=None) -> ResNetRFS:
    no_dropblock = bool(getattr(opt, "no_dropblock", False))
    if dataset in ("miniImageNet", "tieredImageNet"):
        if name.startswith("resnet") or name.startswith("seresnet"):
            # avg_pool=True, drop_rate=0.1, dropblock_size=5
            # (reference models/util.py:16-18)
            return model_dict[name](avg_pool=True, drop_rate=0.1,
                                    dropblock_size=5,
                                    no_dropblock=no_dropblock, dtype=dtype)
        raise NotImplementedError(
            "model {} not supported in dataset {}".format(name, dataset))
    if dataset in ("CIFAR-FS", "FC100"):
        if name.startswith("resnet") or name.startswith("seresnet"):
            # dropblock_size=2 for CIFAR (reference models/util.py:27)
            return model_dict[name](avg_pool=True, drop_rate=0.1,
                                    dropblock_size=2,
                                    no_dropblock=no_dropblock, dtype=dtype)
        raise NotImplementedError(
            "model {} not supported in dataset {}".format(name, dataset))
    raise NotImplementedError("dataset not supported: {}".format(dataset))
