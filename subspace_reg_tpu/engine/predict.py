"""Serving path: jitted batch classification over the padded head.

The reference has no inference entry point beyond ad-hoc ``validate``
loops; deployment of an incrementally-trained classifier needs a stable
predict API.  ``make_predict_fn`` returns a compiled function mapping raw
uint8 images to (labels, probabilities) using the deterministic eval
transform — the exact preprocessing the engine's query path uses — with
optional human-readable label decoding via ``label2human``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..data.transforms import transforms_test_options
from ..models import head as head_lib
from ..ops import augment as aug_ops


def make_predict_fn(backbone, variables, head: head_lib.Head,
                    transform: str = "A"):
    """Returns predict(images_u8 (B,H,W,3)) -> (labels (B,), probs (B,C))."""
    _, test_spec = transforms_test_options[transform]
    frozen_vars = {"params": variables["params"],
                   "batch_stats": variables["batch_stats"],
                   "counters": variables["counters"]}

    @jax.jit
    def predict(images_u8):
        x = aug_ops.normalize_batch(images_u8, test_spec)
        feats = backbone.apply(frozen_vars, x, train=False)
        logits = head_lib.logits(head, feats)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.argmax(logits, axis=-1), probs

    return predict


def decode_labels(labels, label2human: Sequence[str],
                  training_classes: Optional[dict] = None):
    """Map predicted row indices back to human-readable names.  Base rows
    (relabel via basec_map) and appended novel rows both resolve through
    the checkpoint's ``label2human`` metadata."""
    import numpy as np
    rev = {}
    if training_classes:
        rev = {v: k for k, v in training_classes.items()}
    out = []
    for l in np.asarray(labels).tolist():
        orig = rev.get(l, l)
        name = (label2human[orig]
                if 0 <= orig < len(label2human) else str(orig))
        out.append(name if name else str(orig))
    return out
