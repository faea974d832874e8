"""Serving predict path."""

import numpy as np

import jax
import jax.numpy as jnp

from subspace_reg_tpu.engine.predict import make_predict_fn, decode_labels
from subspace_reg_tpu.models import head as head_lib
from subspace_reg_tpu.models.resnet import ResNetRFS


def test_predict_fn_shapes_and_decoding():
    backbone = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                         no_dropblock=True, avg_pool=True,
                         widths=(8, 16, 24, 32))
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 16, 16, 3)), train=False)
    head = head_lib.init_head(jax.random.PRNGKey(1), 7, in_dim=32,
                              with_bias=False, max_classes=12)
    predict = make_predict_fn(backbone, variables, head)
    imgs = np.random.RandomState(0).randint(
        0, 256, (5, 16, 16, 3)).astype(np.uint8)
    labels, probs = predict(jnp.asarray(imgs))
    assert labels.shape == (5,) and probs.shape == (5, 12)
    assert np.all(np.asarray(labels) < 7)          # padded rows masked
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, rtol=1e-5)

    names = decode_labels(labels, [f"class {i}" for i in range(100)],
                          training_classes={i + 40: i for i in range(7)})
    assert all(n.startswith("class ") for n in names)
    # base row 0 maps back to original class 40
    assert decode_labels([0], [f"c{i}" for i in range(100)],
                         {40: 0})[0] == "c40"
