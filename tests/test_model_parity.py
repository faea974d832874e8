"""Numeric parity of the Flax backbone against the PyTorch reference model.

The reference implementation (mounted read-only) is used purely as an
oracle: we build its torch module, export the state_dict, import it through
our .pth converter path, and compare eval-mode forward outputs.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.models.factory import create_model
from subspace_reg_tpu.models import head as head_lib
from subspace_reg_tpu.utils import torch_import


class _Opt:
    no_dropblock = True
    linear_bias = False


def _torch_reference_model(name, n_cls, linear_bias):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from models.resnet_language import (
            resnet12, resnet18, resnet24, resnet50, seresnet12)
    finally:
        sys.path.pop(0)
    opt = _Opt()
    opt.linear_bias = linear_bias
    factory = {"resnet12": resnet12, "resnet18": resnet18,
               "resnet24": resnet24, "resnet50": resnet50,
               "seresnet12": seresnet12}[name]
    torch.manual_seed(7)
    model = factory(avg_pool=True, drop_rate=0.1, dropblock_size=5,
                    num_classes=n_cls, opt=opt)
    model.eval()
    return model


def _full_variables(model, imported, spatial=84):
    init_vars = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, spatial, spatial, 3)), train=False)
    # structural validation: imported tree must cover the init tree exactly
    flat_init = jax.tree_util.tree_leaves_with_path(init_vars["params"])
    flat_imp = jax.tree_util.tree_leaves_with_path(imported["params"])
    keys_init = {jax.tree_util.keystr(p) for p, _ in flat_init}
    keys_imp = {jax.tree_util.keystr(p) for p, _ in flat_imp}
    assert keys_init == keys_imp, (
        f"missing={keys_init - keys_imp} extra={keys_imp - keys_init}")
    return {"params": imported["params"],
            "batch_stats": imported["batch_stats"],
            "counters": init_vars["counters"]}


@pytest.mark.parametrize("name", ["resnet12", "resnet18", "resnet24",
                                  "resnet50"])
def test_backbone_forward_parity(name, reference_path):
    torch = pytest.importorskip("torch")
    n_cls = 60
    tmodel = _torch_reference_model(name, n_cls, linear_bias=False)
    sd = torch_import.state_dict_to_numpy(tmodel.state_dict())

    x = np.random.RandomState(1).randn(4, 3, 84, 84).astype(np.float32)
    with torch.no_grad():
        tfeat, tlogit = tmodel(torch.from_numpy(x), is_feat=True)
    tfeat = tfeat[-1].numpy()
    tlogit = tlogit.numpy()

    jmodel = create_model(name, n_cls, _Opt())
    variables = _full_variables(jmodel, torch_import.import_backbone(sd))
    jhead = torch_import.import_head(sd, max_classes=100)

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    jfeat = jmodel.apply(variables, xj, train=False)
    jlogit_full = head_lib.logits(jhead, jfeat)

    np.testing.assert_allclose(np.asarray(jfeat), tfeat, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jlogit_full[:, :n_cls]), tlogit,
                               rtol=2e-4, atol=2e-4)
    # padded rows are masked to -inf-equivalents
    assert np.all(np.asarray(jlogit_full[:, n_cls:]) <= head_lib.NEG_INF)


def test_backbone_train_mode_bn_updates(reference_path):
    """Train-mode forward must match torch batch-stat BN + running-stat EMA."""
    torch = pytest.importorskip("torch")
    tmodel = _torch_reference_model("resnet12", 60, linear_bias=False)
    # drop_rate>0 means dropout is active in train mode; zero it for the
    # deterministic comparison (we compare BN semantics, not dropout RNG)
    for m in tmodel.modules():
        if hasattr(m, "drop_rate"):
            m.drop_rate = 0.0
    sd = torch_import.state_dict_to_numpy(tmodel.state_dict())
    x = np.random.RandomState(2).randn(8, 3, 84, 84).astype(np.float32)

    tmodel.train()
    with torch.no_grad():
        tfeat, _ = tmodel(torch.from_numpy(x), is_feat=True)
    tfeat = tfeat[-1].numpy()
    post_sd = torch_import.state_dict_to_numpy(tmodel.state_dict())

    class _NoDropOpt:
        no_dropblock = True

    from subspace_reg_tpu.models.resnet import ResNetRFS
    jmodel = ResNetRFS(n_blocks=(1, 1, 1, 1), drop_rate=0.0,
                       no_dropblock=True, avg_pool=True)
    variables = _full_variables(jmodel, torch_import.import_backbone(sd))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    jfeat, updated = jmodel.apply(
        variables, xj, train=True,
        mutable=["batch_stats", "counters"],
        rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(jfeat), tfeat, rtol=5e-4, atol=5e-4)

    # running stats after one train-mode forward must match torch's EMA
    ref_mean = post_sd["layer1.0.bn1.running_mean"]
    got_mean = np.asarray(updated["batch_stats"]["layer1_0"]["bn1"]["mean"])
    np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-4, atol=1e-5)
    ref_var = post_sd["layer1.0.bn1.running_var"]
    got_var = np.asarray(updated["batch_stats"]["layer1_0"]["bn1"]["var"])
    np.testing.assert_allclose(got_var, ref_var, rtol=1e-4, atol=1e-5)
