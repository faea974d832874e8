"""Offline coverage for the network-gated embedding-asset tools
(utils/embed_tools.py, reference util.py:53-130): the torchnlp/Vico and
transformers dependencies are mocked so the pickle-building logic — word
splitting, schema, idempotent reuse, missing-dependency message — is
testable without egress."""

import os
import pickle
import sys
import types

import numpy as np
import pytest

from subspace_reg_tpu.utils.embed_tools import create_and_save_embeds


class Opt:
    dataset = "miniImageNet"
    word_embed_size = 500


def _install_fake_torchnlp(monkeypatch, recorded):
    class FakeVico:
        def __init__(self, name, dim, is_include):
            assert name == "linear"          # reference util.py:72-75
            recorded["dim"] = dim
            vocab_words = ["golden", "retriever", "organ"]
            included = [w for w in vocab_words if is_include(w)]
            recorded["included"] = included
            self.token_to_index = {w: i for i, w in enumerate(included)}
            self._vecs = {
                w: np.full((dim,), float(i), np.float32)
                for i, w in enumerate(included)}

        def __getitem__(self, w):
            class T:
                def __init__(self, a):
                    self._a = a

                def numpy(self):
                    return self._a
            return T(self._vecs[w])

    mod = types.ModuleType("torchnlp")
    sub = types.ModuleType("torchnlp.word_to_vector")
    sub.Vico = FakeVico
    mod.word_to_vector = sub
    monkeypatch.setitem(sys.modules, "torchnlp", mod)
    monkeypatch.setitem(sys.modules, "torchnlp.word_to_vector", sub)


def test_create_and_save_embeds_schema(tmp_path, monkeypatch):
    recorded = {}
    _install_fake_torchnlp(monkeypatch, recorded)
    opt = Opt()
    opt.word_embed_path = str(tmp_path / "we")

    pth = create_and_save_embeds(opt, ["golden retriever", "organ"])
    # multi-word labels are split into words before the include filter
    # (reference util.py:62-64)
    assert set(recorded["included"]) == {"golden", "retriever", "organ"}
    assert recorded["dim"] == 500
    assert pth == os.path.join(opt.word_embed_path,
                               "miniImageNet_dim500.pickle")
    with open(pth, "rb") as f:
        d = pickle.load(f)
    # interchange schema: {word: np.ndarray(dim)}
    assert set(d) == {"golden", "retriever", "organ"}
    for v in d.values():
        assert isinstance(v, np.ndarray) and v.shape == (500,)

    # our get_embeds consumes the pickle this tool writes
    from subspace_reg_tpu.models.embeds import get_embeds
    e = np.asarray(get_embeds(pth, ["golden retriever"], 500))
    np.testing.assert_allclose(
        e[0], (d["golden"] + d["retriever"]) / 2, rtol=1e-6)


def test_create_and_save_embeds_idempotent(tmp_path, monkeypatch):
    """An existing pickle short-circuits (reference util.py:58-60) — no
    torchnlp import, no network."""
    opt = Opt()
    opt.word_embed_path = str(tmp_path)
    pth = os.path.join(str(tmp_path), "miniImageNet_dim500.pickle")
    with open(pth, "wb") as f:
        pickle.dump({"x": np.zeros(500)}, f)
    # no fake torchnlp installed: would raise if the tool tried to build
    assert create_and_save_embeds(opt, ["x"]) == pth


def test_create_and_save_embeds_missing_dependency(tmp_path, monkeypatch):
    """Without torchnlp the tool fails with a pointer to the reference's
    shipped pickle assets instead of a bare ImportError."""
    monkeypatch.setitem(sys.modules, "torchnlp", None)
    opt = Opt()
    opt.word_embed_path = str(tmp_path / "nope")
    with pytest.raises(RuntimeError, match="pre-generated"):
        create_and_save_embeds(opt, ["cat"])
