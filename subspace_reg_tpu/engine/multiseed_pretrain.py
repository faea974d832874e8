"""Vmapped multi-seed backbone pretraining — the TPU replacement for the
reference's Slurm seed array over ``train_supervised.py`` (reference
scripts/continual/slurm_run_backbone.sh:8,30-40: 10 single-GPU 100-epoch
jobs, one per ``--set_seed``).

Why vmap instead of 10 sequential runs: one program, one compile, one
staging pass, one process.  The reference pretrains at batch 64
(configs.py:124); vmapping S seeds stacks their (64, 84, 84, 3) batches into
one program whose convs run with per-seed weights (XLA lowers the vmapped
conv with a batch-group dimension — the same pattern the vmapped FSCIL
engine's eval forwards run on hardware, engine/multiseed.py).  Measured on
v5e (round 3): aggregate throughput EQUALS the sequential single-seed rate
(2,862 vs 2,859 img/s — batch-grouped convs cannot share MXU tiles across
lanes the way a shared-weight batch does), so the single-chip win is
operational, not arithmetic: the 1.2GB image store stages once for every
seed and group, the step/eval programs compile once, resume is
per-fan-out instead of per-Slurm-job, and ``shard_over_devices`` lays the
seed axis over a mesh for the true parallel counterpart of the 10-GPU
array.

Faithfulness contract: each lane reproduces the single-seed trainer exactly —

  * per-seed continual splits (np.random call sequence preserved by
    ``load_mini_imagenet``; lanes select DIFFERENT rows and carry different
    label mappings),
  * per-seed model/head init streams (``PRNGKey(set_seed)``, matching
    ``train_supervised.py:108-110``),
  * per-seed epoch shuffles from ``np.random.RandomState(set_seed)``
    (the DataLoader shuffle contract, train_supervised.py:251,262-270),
  * per-seed dropout/augment key = ``PRNGKey(set_seed)`` folded with the
    step counter (engine/pretrain.py step_impl),
  * per-lane BN batch statistics (vmap keeps each lane's stats separate —
    the batch-64 BN semantics of the reference are untouched).

Data residency: every seed's split is a ``LazyRows`` view over the SAME
pickle-cached array (data/mini_imagenet.py), so the engine stages the full
uint8 array in HBM once and keeps per-seed row selections and labels as
small device tables; each step ships only an (S, B) index vector.

Scope (asserted): plain-CE pretraining — the golden backbone fan-out
(slurm_run_backbone.sh has no distill/label_pull flags).  KD/NCE/CRD and
label_pull stay on the single-seed path.
"""

from __future__ import annotations

import time
from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.mini_imagenet import LazyRows
from ..data.transforms import transforms_options
from ..ops import augment as aug_ops
from ..ops import losses
from ..utils import optim as optim_lib
from . import pretrain as pt

# engine-read scalar fields that must agree across lanes (everything except
# the seed and I/O paths; mirrors the session-program cache philosophy —
# over-include so a mismatch can only fail loudly, never silently diverge)
_SHARED_FIELDS = (
    "model", "dataset", "transform", "continual", "use_trainval",
    "batch_size", "epochs", "learning_rate", "lr_decay_rate",
    "lr_decay_epochs_list", "cosine", "adam", "weight_decay", "momentum",
    "linear_bias", "no_dropblock", "save_freq",
)


# staged-array cache across seed GROUPS (keyed by host-array identity,
# holding the host ref — the pickle cache hands every group the same
# ndarray, so one ~GB upload serves the whole fan-out; same design as the
# eval engine's _novel_stage_cache)
_stage_cache: dict = {}

# traced-program cache across engine invocations, keyed on the schedule/
# geometry fingerprint (see pkey below)
_program_cache: dict = {}


def _stage_shared(full, data_sharding):
    # sharded puts are keyed by the device set too: successive groups of a
    # --shard_seeds fan-out build equal meshes over the same chips, so the
    # replicated store is reusable; a different device set misses
    devs = (None if data_sharding is None else
            tuple(sorted(d.id for d in data_sharding.mesh.devices.flat)))
    key = (id(full), devs)
    cached = _stage_cache.get(key)
    if cached is not None and cached[0] is full:
        return cached[1]
    if data_sharding is not None:
        dev = jax.device_put(np.asarray(full), data_sharding)
    else:
        dev = jnp.asarray(full)
    while len(_stage_cache) >= 2:   # train + val may differ; avoid thrash
        _stage_cache.pop(next(iter(_stage_cache)))
    _stage_cache[key] = (full, dev)
    return dev


class MultiseedPretrainResult:
    def __init__(self, seeds, train_metrics, val_metrics, images_per_sec):
        self.seeds = list(seeds)
        # per-epoch lists of per-seed dicts: [{'loss','acc1','acc5'}, ...]
        self.train_metrics = train_metrics
        self.val_metrics = val_metrics
        self.images_per_sec = images_per_sec


def _make_tx(opt0, steps_per_epoch: int):
    """The single-seed trainer's optimizer build (train_supervised.py:
    95-106); shared by the engine and the resume loader so the optimizer-
    state pytree structure can never drift between them."""
    if opt0.cosine:
        sched = optim_lib.cosine_schedule(
            opt0.learning_rate, opt0.lr_decay_rate, opt0.epochs,
            steps_per_epoch)
    else:
        sched = optim_lib.step_decay_schedule(
            opt0.learning_rate, opt0.lr_decay_epochs_list,
            opt0.lr_decay_rate, steps_per_epoch)
    if opt0.adam:
        return optim_lib.adam_torch(sched, weight_decay=0.0005)
    return optim_lib.sgd_torch(sched, momentum=opt0.momentum,
                               weight_decay=opt0.weight_decay)


def _shared_fingerprint(opts) -> None:
    ref = opts[0]
    for o in opts[1:]:
        for f in _SHARED_FIELDS:
            a, b = getattr(ref, f, None), getattr(o, f, None)
            assert a == b, (
                f"multiseed pretraining requires identical configs across "
                f"seeds; field {f!r} differs: {a!r} vs {b!r}")
    assert getattr(ref, "label_pull", None) is None, (
        "label_pull pretraining is single-seed only (per-seed vocab orders "
        "differ); drop --label_pull or use train_supervised.py per seed")
    assert getattr(ref, "distill", None) in (None, "", "none"), (
        "KD/NCE/CRD fan-out is single-seed only; use train_supervised.py")
    assert not getattr(ref, "faithful_nbt", False), (
        "--faithful_nbt eval counting is single-seed only")
    assert not getattr(ref, "eval_only", False)


def _stage_splits(splits) -> tuple:
    """One HBM copy of the shared backing array + per-seed (S, n) row
    selections.  Eager splits are accepted when every seed got the SAME
    host array (non-continual loads, where the pickle cache hands one
    object to all seeds)."""
    imgs0 = splits[0].imgs
    if isinstance(imgs0, LazyRows):
        full = imgs0.full
        assert all(isinstance(s.imgs, LazyRows) and s.imgs.full is full
                   for s in splits), (
            "lazy splits must share one backing array (same data_root); "
            "load with load_mini_imagenet(..., lazy=True)")
        sel = np.stack([np.asarray(s.imgs.sel, np.int32) for s in splits])
    else:
        assert all(s.imgs is imgs0 for s in splits), (
            "eager per-seed splits with distinct arrays would upload S "
            "copies; load with lazy=True")
        full = imgs0
        sel = np.broadcast_to(
            np.arange(len(imgs0), dtype=np.int32), (len(splits), len(imgs0)))
    labels = np.stack([np.asarray(s.labels, np.int32) for s in splits])
    assert sel.shape == labels.shape
    return full, jnp.asarray(sel), jnp.asarray(labels)


def pretrain_multiseed(
        backbone,
        opts: Sequence[Any],
        train_splits: Sequence[Any],
        val_splits: Sequence[Any],
        n_cls: int,
        save_fn: Optional[Callable[[int, int, Any, bool], None]] = None,
        start_states=None,
        verbose: bool = True,
        data_device: Optional[jax.Array] = None,
        shard_over_devices: bool = False,
        start_epoch: int = 1,
) -> MultiseedPretrainResult:
    """Train S seeds in lockstep through one vmapped step program.

    ``save_fn(seed_index, epoch, host_state, final)`` is called at the
    single-seed trainer's checkpoint cadence (``save_freq`` epochs + final)
    with an all-numpy ``PretrainState`` for that lane.

    ``data_device`` optionally passes an already-staged device copy of the
    shared backing array (reused across engine calls; see run_seeds).

    ``shard_over_devices=True`` lays the seed axis over a 1-D device mesh
    (the shared image store replicates; each chip trains its share of the
    seed batch) — the pod-level counterpart of the reference's Slurm
    backbone array, same pattern as the eval engine's seed sharding.

    ``start_states`` (a per-seed LIST of host ``PretrainState``s, e.g.
    from :func:`load_resume_states`, or an already-stacked device tree)
    plus ``start_epoch`` resume a checkpointed fan-out; the skipped
    epochs' shuffle draws are consumed so the resumed trajectory equals
    the uninterrupted one (the single-seed CLI's --reload_path contract).
    """
    S = len(opts)
    assert S >= 1 and len(train_splits) == len(val_splits) == S
    _shared_fingerprint(opts)
    opt0 = opts[0]
    prt = print if verbose else (lambda *a, **k: None)

    seed_sharding = data_sharding = None
    if shard_over_devices:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        n_dev = max(d for d in range(1, jax.device_count() + 1)
                    if S % d == 0)
        dev_mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("seed",))
        seed_sharding = NamedSharding(dev_mesh, P("seed"))
        data_sharding = NamedSharding(dev_mesh, P())
        prt(f"==> sharding {S} seeds over {n_dev} devices")

    def shard_lanes(x):
        return x if seed_sharding is None else jax.device_put(
            x, seed_sharding)

    train_spec, test_spec = transforms_options[opt0.transform]
    img_size = train_splits[0].imgs.shape[1]
    n_train = len(train_splits[0].labels)
    assert all(len(s.labels) == n_train for s in train_splits), (
        "per-seed train splits must be the same size (fixed per-class "
        "counts make this true for every supported protocol)")
    n_val = len(val_splits[0].labels)
    assert all(len(s.labels) == n_val for s in val_splits)
    steps_per_epoch = n_train // opt0.batch_size

    # ---- optimizer (identical schedule across lanes) --------------------
    tx = _make_tx(opt0, steps_per_epoch)

    # ---- per-lane states (exact single-seed init streams) ---------------
    if start_states is None:
        per_seed = [pt.init_pretrain_state(
            backbone, jax.random.PRNGKey(o.set_seed), n_cls, img_size, tx,
            with_bias=o.linear_bias) for o in opts]
        states = jax.tree_util.tree_map(
            lambda *xs: shard_lanes(jnp.stack(xs)), *per_seed)
        del per_seed
    elif isinstance(start_states, (list, tuple)):
        states = jax.tree_util.tree_map(
            lambda *xs: shard_lanes(jnp.stack([jnp.asarray(x)
                                               for x in xs])),
            *start_states)
    else:
        states = start_states

    # ---- data staging ----------------------------------------------------
    t0 = time.time()
    full_train, sel_tr, lab_tr = _stage_splits(train_splits)
    full_val, sel_va, lab_va = _stage_splits(val_splits)
    sel_tr, lab_tr = shard_lanes(sel_tr), shard_lanes(lab_tr)
    sel_va, lab_va = shard_lanes(sel_va), shard_lanes(lab_va)
    # continual train/val phases share one backing array; stage it once
    # (replicated across the seed mesh — every chip gathers locally)
    if data_device is not None:
        data_dev = data_device
    else:
        data_dev = _stage_shared(full_train, data_sharding)
    val_dev = (data_dev if full_val is full_train
               else _stage_shared(full_val, data_sharding))
    prt(f"==> staged {np.asarray(full_train).nbytes / 1e6:.0f} MB shared "
        f"store for {S} seeds [{time.time() - t0:.1f}s]")

    # ---- programs ---------------------------------------------------------
    # memoized across engine invocations (seed GROUPS of one fan-out):
    # data/selection/label tables are arguments, not closures, so group 2+
    # hits both the trace cache and the compile cache — the eval engine's
    # session-program-cache lesson (a warm retrace costs ~11s through the
    # relay).  The key is the schedule/geometry fingerprint; tx is rebuilt
    # per call but identical given the key.
    pkey = (backbone, opt0.linear_bias, train_spec, test_spec,
            opt0.cosine, opt0.adam, float(opt0.learning_rate),
            float(opt0.lr_decay_rate), float(opt0.weight_decay),
            float(opt0.momentum), tuple(opt0.lr_decay_epochs_list),
            int(opt0.epochs), steps_per_epoch)
    cached = _program_cache.get(pkey)
    if cached is None:
        base = pt.make_train_step(backbone, tx, train_spec,
                                  with_bias=opt0.linear_bias)
        from functools import partial

        def lane_step(state, data_u8, sel_row, lab_row, local_idx, rng):
            gidx = jnp.take(sel_row, local_idx, axis=0)
            x_u8 = jnp.take(data_u8, gidx, axis=0)
            y = jnp.take(lab_row, local_idx, axis=0)
            return base.impl(state, x_u8, y, rng)

        @partial(jax.jit, donate_argnums=(0,))
        def msd_step(states, data_u8, sel, lab, local_idxs, rngs):
            return jax.vmap(lane_step, in_axes=(0, None, 0, 0, 0, 0))(
                states, data_u8, sel, lab, local_idxs, rngs)

        def lane_eval(state, data_u8, sel_row, lab_row, local_idx):
            gidx = jnp.take(sel_row, local_idx, axis=0)
            x = aug_ops.normalize_batch(jnp.take(data_u8, gidx, axis=0),
                                        test_spec)
            y = jnp.take(lab_row, local_idx, axis=0)
            feats = backbone.apply(
                {"params": state.params["backbone"],
                 "batch_stats": state.batch_stats,
                 "counters": state.counters}, x, train=False)
            logits = feats @ state.params["head"]["w"].T
            if opt0.linear_bias:
                logits = logits + state.params["head"]["b"]
            loss = losses.cross_entropy(logits, y)
            acc1, acc5 = losses.accuracy_topk(logits, y)
            return loss, acc1, acc5

        @jax.jit
        def msd_eval(states, data_u8, sel, lab, local_idx):
            return jax.vmap(lane_eval, in_axes=(0, None, 0, 0, None))(
                states, data_u8, sel, lab, local_idx)

        cached = (msd_step, msd_eval)
        while len(_program_cache) >= 4:
            _program_cache.pop(next(iter(_program_cache)))
        _program_cache[pkey] = cached
    msd_step, msd_eval = cached

    rngs = shard_lanes(jnp.stack([jax.random.PRNGKey(o.set_seed)
                                  for o in opts]))
    shuffles = [np.random.RandomState(o.set_seed) for o in opts]
    for rs in shuffles:   # deterministic resume (see docstring)
        for _ in range(start_epoch - 1):
            rs.permutation(n_train)
    save_freq = int(getattr(opt0, "save_freq", 0) or 0)
    eval_bs = max(1, opt0.batch_size // 2)

    def pull_lane_states():
        host = jax.device_get(states)
        return [jax.tree_util.tree_map(lambda x: np.asarray(x[i]), host)
                for i in range(S)]

    train_metrics: List[List[dict]] = []
    val_metrics: List[List[dict]] = []
    ips_l: List[float] = []

    for epoch in range(start_epoch, opt0.epochs + 1):
        te = time.time()
        # per-seed DataLoader shuffle (shuffle=True, drop_last=True)
        end = steps_per_epoch * opt0.batch_size
        orders = np.stack([rs.permutation(n_train)[:end]
                           for rs in shuffles]).astype(np.int32)
        epoch_ms: List[Any] = []
        for bi in range(steps_per_epoch):
            li = shard_lanes(jnp.asarray(
                orders[:, bi * opt0.batch_size:(bi + 1) * opt0.batch_size]))
            states, m = msd_step(states, data_dev, sel_tr, lab_tr, li,
                                 rngs)
            epoch_ms.append(m)
        # ONE stacked metric pull per epoch (each float() through the relay
        # costs a ~0.1s round-trip)
        stacked = jax.device_get(
            jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *epoch_ms))
        dt = time.time() - te
        ips = S * steps_per_epoch * opt0.batch_size / dt
        ips_l.append(ips)
        train_metrics.append([
            {k: float(stacked[k][:, i].mean()) for k in stacked}
            for i in range(S)])
        if verbose:
            la = ", ".join(f"s{o.set_seed}:{d['acc1']:.2f}"
                           for o, d in zip(opts, train_metrics[-1]))
            prt(f"epoch {epoch} [{dt:.1f}s, {ips:.0f} img/s aggregate] "
                f"train acc1 {la}")

        # validation, chunked like run_validation (batch_size // 2)
        tot = np.zeros((3, S))
        for i in range(0, n_val, eval_bs):
            idx = jnp.arange(i, min(i + eval_bs, n_val), dtype=jnp.int32)
            loss, a1, a5 = jax.device_get(
                msd_eval(states, val_dev, sel_va, lab_va, idx))
            w = len(idx)
            tot += np.stack([loss, a1, a5]) * w
        tot /= n_val
        val_metrics.append([
            {"loss": float(tot[0, i]), "acc1": float(tot[1, i]),
             "acc5": float(tot[2, i])} for i in range(S)])
        if verbose:
            la = ", ".join(f"s{o.set_seed}:{d['acc1']:.2f}"
                           for o, d in zip(opts, val_metrics[-1]))
            prt(f"  * val acc1 {la}")

        if save_fn is not None and save_freq and epoch % save_freq == 0:
            for i, hs in enumerate(pull_lane_states()):
                save_fn(i, epoch, hs, False)

    if save_fn is not None and start_epoch <= opt0.epochs:
        # nothing-to-do resumes (start_epoch > epochs) skip the final save
        # rather than re-writing identical checkpoints
        for i, hs in enumerate(pull_lane_states()):
            save_fn(i, opt0.epochs, hs, True)
    elif start_epoch > opt0.epochs:
        prt(f"==> nothing to do: resumed at epoch {start_epoch} with "
            f"--epochs {opt0.epochs}")

    res = MultiseedPretrainResult([o.set_seed for o in opts],
                                  train_metrics, val_metrics, ips_l)
    res.final_states = states
    res.start_epoch = start_epoch
    return res


def load_resume_states(backbone, opts, n_cls: int, img_size: int,
                       ckpt_paths: Sequence):
    """Rebuild per-seed host ``PretrainState``s from fan-out checkpoints
    (the reference's Slurm restart loses optimizer state; ours restores
    params, BN stats, counters, momentum buffers and the step counter
    bit-exactly — the single-seed CLI's --reload_path contract,
    train_supervised.py:116-136).

    Each ``ckpt_paths`` entry is a path or a list of CANDIDATE paths for
    that seed (e.g. ``<model>_last.ckpt`` plus ``ckpt_epoch_N``s); the
    candidate with the highest checkpointed epoch wins, so a stale _last
    from an earlier completed run cannot shadow newer interrupted-run
    progress.  Leaves stay on host (numpy) — the engine host-stacks every
    lane and uploads ONE packed transfer (the relay-diet rule; see
    checkpoint.load_checkpoint's device=False contract).

    Returns ``(per_seed_states, start_epoch)`` for
    ``pretrain_multiseed(start_states=..., start_epoch=...)``.
    """
    from ..utils.checkpoint import load_checkpoint

    opt0 = opts[0]
    # template for the optimizer-state pytree STRUCTURE (shared build
    # with the engine; schedule values are irrelevant to the shape)
    template = pt.init_pretrain_state(
        backbone, jax.random.PRNGKey(0), n_cls, img_size,
        _make_tx(opt0, steps_per_epoch=1), with_bias=opt0.linear_bias)

    per_seed, epochs = [], set()
    for cands in ckpt_paths:
        if isinstance(cands, str):
            cands = [cands]
        best = None
        for path in cands:
            variables, head, meta = load_checkpoint(
                path, extra_template={"opt_state": template.opt_state,
                                      "step": template.step},
                device=False)
            ep = int(meta.get("epoch", 0))
            if best is None or ep > best[0]:
                best = (ep, path, variables, head, meta)
        ep, path, variables, head, meta = best
        params = {"backbone": variables["params"],
                  "head": {"w": np.asarray(head.weight)[:n_cls]}}
        if opt0.linear_bias:
            params["head"]["b"] = np.asarray(head.bias)[:n_cls]
        extra = meta.get("extra", {})
        assert "opt_state" in extra and "step" in extra, (
            f"{path} carries no optimizer state; it cannot resume "
            f"deterministically")
        per_seed.append(pt.PretrainState(
            params=params, batch_stats=variables["batch_stats"],
            counters=variables.get("counters", template.counters),
            opt_state=extra["opt_state"], step=extra["step"]))
        epochs.add(ep)
    assert len(epochs) == 1, (
        f"seeds checkpointed at different epochs {sorted(epochs)}; resume "
        f"needs a consistent fan-out snapshot")
    return per_seed, epochs.pop() + 1
