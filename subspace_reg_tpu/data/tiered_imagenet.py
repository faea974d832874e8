"""tieredImageNet loading (reference dataset/tiered_imagenet.py:9-122).

npz image archives + pickled ``label_specific`` labels; optional pooling of
train_a + train_b for 351-class pretraining (:58-67).

Note: the reference's own tiered pretraining entry is latently broken — it
passes ``split=``/``phase=`` keywords (train_supervised.py:74-80) that
``TieredImageNet.__init__`` does not accept.  This implementation keeps the
documented file-layout semantics and exposes a working (partition, phase)
interface.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .mini_imagenet import SplitData
from .pickles import load_labels_pkl

# npz image cache keyed by (abspath, mtime) — the multi-seed pretraining
# fan-out loads the SAME seed-independent tiered split once per seed; a
# shared host array lets the engine stage ONE device copy for every lane
# (eager-identity path of multiseed_pretrain._stage_splits) instead of S
# multi-GB re-reads.  Same design as pickles.load_pickle_latin1.
_npz_cache: dict = {}


def _load_npz_images(path: str) -> np.ndarray:
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _npz_cache:
        while len(_npz_cache) >= 3:   # train/val phases + train_b
            _npz_cache.pop(next(iter(_npz_cache)))
        _npz_cache[key] = np.load(path)["images"]
    return _npz_cache[key]


def load_tiered_imagenet(opt, partition: str = "train",
                         phase: Optional[str] = None,
                         pretrain: bool = True) -> SplitData:
    if pretrain:
        word = phase or partition
        image_file = os.path.join(
            opt.data_root, f"train_a_train_a_phase_{word}_images.npz")
        label_file = os.path.join(
            opt.data_root, f"train_a_train_a_phase_{word}_labels.pkl")
    else:
        image_file = os.path.join(opt.data_root, f"{partition}_images.npz")
        label_file = os.path.join(opt.data_root, f"{partition}_labels.pkl")

    imgs = _load_npz_images(image_file)
    label_data = load_labels_pkl(label_file)
    labels = np.asarray(label_data["label_specific"])

    # pool train_b for 351-class pretraining (tiered_imagenet.py:58-67)
    if pretrain and partition == "train" and (phase in (None, "train")) \
            and getattr(opt, "augment_pretrain_wtrainb", False):
        second_imgs = np.load(
            os.path.join(opt.data_root, "train_b_images.npz"))["images"]
        second_labels = load_labels_pkl(
            os.path.join(opt.data_root, "train_b_labels.pkl"))["label_specific"]
        num_classes = int(np.max(labels)) + 1
        labels = np.concatenate(
            (labels, num_classes + np.asarray(second_labels)), axis=0)
        imgs = np.concatenate((imgs, second_imgs), axis=0)

    # human-readable labels if the pickle carries them, else synthesized
    n_classes = int(np.max(labels)) + 1
    if "label_specific_str" in label_data:
        names = list(label_data["label_specific_str"])
        label2human = [str(n).lower().replace("_", " ") for n in names]
        label2human += [""] * (n_classes - len(label2human))
    else:
        label2human = [f"class {i}" for i in range(n_classes)]

    return SplitData(imgs=imgs, labels=labels.tolist(), cat2label={},
                     label2human=label2human)
