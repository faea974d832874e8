"""N-step pretraining-loop oracle: our fused train step's trajectory must
match the reference's hot loop executed by the reference's own torch model
(/root/reference/train_supervised.py:216-244 — forward, CE, backward,
torch-SGD with momentum+weight-decay, train-mode BN updates).

The component pieces are individually oracle-verified (model logits:
test_model_parity; torch-exact SGD/Adam: test_optim; BN train-mode
updates: test_model_parity BN test).  This pins their COMPOSITION over
several optimizer steps, including the momentum buffers and running-stat
EMAs the composition threads between steps.

Stochastic pieces are disabled identically on both sides (drop_rate=0,
no dropblock, deterministic normalize-only transform): the remaining
difference is conv-implementation rounding, so tolerances are float-tight
rather than chaos-envelope.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from subspace_reg_tpu.data.transforms import transforms_options
from subspace_reg_tpu.engine import pretrain as pt
from subspace_reg_tpu.utils import optim as optim_lib
from subspace_reg_tpu.utils import torch_import

pytestmark = pytest.mark.slow

N_CLS = 10
BATCH = 16
STEPS = 3
LR = 0.01
WD = 5e-4
MOMENTUM = 0.9


class _Opt:
    no_dropblock = True
    linear_bias = False


def _torch_model(torch):
    sys.path.insert(0, "/root/reference")
    try:
        from models.resnet_language import resnet12
    finally:
        sys.path.pop(0)
    torch.manual_seed(11)
    model = resnet12(avg_pool=True, drop_rate=0.0, dropblock_size=5,
                     num_classes=N_CLS, opt=_Opt())
    for m in model.modules():
        if hasattr(m, "drop_rate"):
            m.drop_rate = 0.0
    return model


def test_pretrain_loop_trajectory_parity(reference_path):
    torch = pytest.importorskip("torch")
    tmodel = _torch_model(torch)
    sd = torch_import.state_dict_to_numpy(tmodel.state_dict())

    # ---- shared inputs: fixed uint8 batches + labels -------------------
    rs = np.random.RandomState(5)
    xs = rs.randint(0, 256, size=(STEPS, BATCH, 84, 84, 3)).astype(np.uint8)
    ys = rs.randint(0, N_CLS, size=(STEPS, BATCH)).astype(np.int64)

    _, test_spec = transforms_options["A"]
    mean = np.asarray(test_spec.mean, np.float32)
    std = np.asarray(test_spec.std, np.float32)

    # ---- torch: the reference hot loop ---------------------------------
    opt_t = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM,
                            weight_decay=WD)
    crit = torch.nn.CrossEntropyLoss()
    tmodel.train()
    t_losses = []
    for i in range(STEPS):
        x = xs[i].astype(np.float32) / 255.0
        x = (x - mean) / std
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()
        logits = tmodel(xt)
        loss = crit(logits, torch.from_numpy(ys[i]))
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))
    post = torch_import.state_dict_to_numpy(tmodel.state_dict())

    # ---- ours: the jitted step on the imported weights ------------------
    # drop_rate=0 to match the zeroed torch side (create_model's default
    # 0.1 would put live dropout in the train-mode forward)
    from subspace_reg_tpu.models import model_dict
    jmodel = model_dict["resnet12"](avg_pool=True, drop_rate=0.0,
                                    no_dropblock=True)
    imported = torch_import.import_backbone(sd)
    init_vars = jmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 84, 84, 3)), train=False)
    sched = optim_lib.step_decay_schedule(LR, [60, 80], 0.1,
                                          steps_per_epoch=1000)
    tx = optim_lib.sgd_torch(sched, momentum=MOMENTUM, weight_decay=WD)
    params = {"backbone": imported["params"],
              "head": {"w": jnp.asarray(sd["classifier.weight"])}}
    state = pt.PretrainState(
        params=params, batch_stats=imported["batch_stats"],
        counters=init_vars["counters"], opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32))
    # test_spec has no crop/jitter/flip: augment_batch reduces to the
    # deterministic normalize the torch side applies
    step = pt.make_train_step(jmodel, tx, test_spec, with_bias=False)
    key = jax.random.PRNGKey(3)   # consumed only by (zeroed) dropout
    j_losses = []
    for i in range(STEPS):
        state, m = step(state, jnp.asarray(xs[i]), jnp.asarray(ys[i]), key)
        j_losses.append(float(m["loss"]))

    # ---- compare trajectories ------------------------------------------
    # the loss trajectory is the tight gate: steps 2-3's losses depend on
    # the params steps 1-2 produced, so agreement here certifies the whole
    # composition.  Param/stat comparisons carry a slightly looser bound —
    # 3 steps of conv-backend rounding amplified by BN's 1/std reach ~5e-4
    # on isolated elements (measured: 1/1728 at 5.5e-4).
    np.testing.assert_allclose(j_losses, t_losses, rtol=1e-4, atol=1e-4)

    want = torch_import.import_backbone(post)
    got_p = jax.device_get(state.params["backbone"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        got_p, want["params"])
    got_bs = jax.device_get(state.batch_stats)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        got_bs, want["batch_stats"])
    np.testing.assert_allclose(np.asarray(state.params["head"]["w"]),
                               post["classifier.weight"],
                               rtol=1e-3, atol=1e-3)
