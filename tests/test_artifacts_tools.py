"""Artifacts utilities + learn_mapping tool."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_mean_confidence_interval():
    from subspace_reg_tpu.utils.artifacts import mean_confidence_interval
    data = [1.0, 2.0, 3.0, 4.0, 5.0]
    m, h = mean_confidence_interval(data)
    assert m == pytest.approx(3.0)
    assert 1.5 < h < 2.5  # t-interval for n=5, std=1.58


def test_nn_and_cosine_classifiers():
    from subspace_reg_tpu.utils.artifacts import nn_classifier, cosine_classifier
    support = np.array([[1.0, 0.0], [0.0, 1.0]])
    ys = [7, 9]
    query = np.array([[0.9, 0.1], [0.1, 0.8]])
    assert nn_classifier(support, ys, query) == [7, 9]
    assert cosine_classifier(support, ys, query) == [7, 9]


def test_map2original():
    from subspace_reg_tpu.utils.artifacts import map2original
    id2orig = {60: 77, 61: 78}
    basec_rev = {0: 5, 1: 9}
    out = map2original([[60, 61], [0, 1]], [id2orig, basec_rev])
    assert out == [[77, 78], [5, 9]]
    with pytest.raises(ValueError):
        map2original([[0]], [{0: 1}, {0: 2}])


def test_image_formatter_html():
    from subspace_reg_tpu.utils.artifacts import image_formatter
    im = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    html = image_formatter(im)
    assert html.startswith('<img src="data:image/jpeg;base64,')


def test_learn_mapping_converges():
    from learn_mapping import train_linear_map
    r = np.random.RandomState(0)
    w_true = r.randn(12, 6).astype(np.float32)
    x = r.randn(20, 6).astype(np.float32)
    t = x @ w_true.T            # (20, 12) exact linear relation
    w, b = train_linear_map(x, t, lr=0.1, wd=0.0, epochs=2000)
    pred = x @ w.T + b
    assert float(np.mean((pred - t) ** 2)) < 1e-2


def test_save_predictions_csv(tmp_path):
    from subspace_reg_tpu.utils.artifacts import save_predictions_csv
    p = str(tmp_path / "preds.csv")
    save_predictions_csv(p, {"Episode": np.array([0, 0]),
                             "Gold": np.array([60, 1]),
                             "Prediction": np.array([60, 2])})
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "Episode,Gold,Prediction"
    assert lines[1] == "0,60,60"
