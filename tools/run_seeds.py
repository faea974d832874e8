#!/usr/bin/env python
"""Multi-seed FSCIL fan-out — the TPU replacement for the reference's Slurm
seed arrays (scripts/continual/slurm_*.sh:8,19-27: 10 single-GPU jobs).

On one chip the incremental phase is seconds per seed, so the fan-out is a
simple loop with aggregated statistics (mean ± 95% CI via
utils/artifacts.mean_confidence_interval — the reference's version of which
is broken, eval/util.py:42-47).

Usage:
  python tools/run_seeds.py --seeds 1 2 3 ... -- <eval_incremental args
      without --set_seed>

  # backbone pretraining fan-out (reference slurm_run_backbone.sh:30-40):
  python tools/run_seeds.py --pretrain --vmap --seeds 1 2 3 ... -- \
      <train_supervised args without --set_seed>
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _run_vmapped(args, rest):
    """All seeds in one vmapped engine execution (engine/multiseed.py)."""
    from subspace_reg_tpu.config import parse_option_eval
    from subspace_reg_tpu.data.episodes import EpisodeSampler
    from subspace_reg_tpu.data.eval_splits import load_eval_splits
    from subspace_reg_tpu.engine.incremental import session_count
    from subspace_reg_tpu.engine.multiseed import few_shot_finetune_multiseed
    from subspace_reg_tpu.models.factory import create_model
    from subspace_reg_tpu.utils.checkpoint import load_any

    import time as _t
    _run_vmapped._t0 = _t.time()
    opts, variables_l, heads, metas = [], [], [], []
    samplers, base_tests, base_supports = [], [], []
    backbone = None
    for seed in args.seeds:
        argv = rest + ["--set_seed", str(seed)]
        if args.model_path_pattern:
            argv += ["--model_path",
                     args.model_path_pattern.format(seed=seed)]
        opt = parse_option_eval(argv)
        # shared loader dispatch + session-budget clamp (ONE
        # implementation with eval_incremental.py:
        # subspace_reg_tpu/data/eval_splits.py).  lazy=True: mini/CIFAR
        # splits are LazyRows views over the shared pickle array — no
        # per-seed gathered copies, and the engine stages the full array
        # on device ONCE for all seeds and groups; tiered's splits are
        # seed-independent npz-cached arrays served by the engine's
        # eager-identity staging.
        base_test, base_train, novel, n_cls = load_eval_splits(
            opt, lazy=True)
        n_sessions = session_count(opt)
        max_classes = n_cls + n_sessions * opt.n_ways
        # device=False: per-seed trees stay on host; the multiseed engine
        # stacks them and uploads ONE packed transfer for the whole fleet
        # (leaf-by-leaf uploads pay ~0.1s relay round-trip each).
        # Cached by path: seeds sharing one checkpoint then share leaf
        # OBJECTS, which lets the engine upload a single broadcast copy.
        import os as _os
        ck = (_os.path.abspath(opt.model_path),
              _os.path.getmtime(opt.model_path), max_classes)
        if not hasattr(_run_vmapped, "_ckpt_cache"):
            _run_vmapped._ckpt_cache = {}
        if ck not in _run_vmapped._ckpt_cache:
            while len(_run_vmapped._ckpt_cache) >= 12:
                _run_vmapped._ckpt_cache.pop(
                    next(iter(_run_vmapped._ckpt_cache)))
            _run_vmapped._ckpt_cache[ck] = load_any(
                opt.model_path, max_classes=max_classes, device=False)
        variables, head, meta = _run_vmapped._ckpt_cache[ck]
        if backbone is None:
            backbone = create_model(opt.model, n_cls, opt,
                                    dataset=opt.dataset)
        if "counters" not in variables:
            if not hasattr(_run_vmapped, "_counters0"):
                import jax
                import jax.numpy as jnp
                init_vars = backbone.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 84, 84, 3)),
                    train=False)
                # host copy: keeps the per-seed trees all-numpy so the
                # multiseed engine can host-stack + packed-upload them
                _run_vmapped._counters0 = jax.device_get(
                    init_vars["counters"])
            variables = dict(variables)
            variables["counters"] = _run_vmapped._counters0
        opts.append(opt)
        variables_l.append(variables)
        heads.append(head)
        metas.append(meta)
        base_tests.append(base_test)
        samplers.append(EpisodeSampler(novel, opt, split="val",
                                       disjoint_classes=True))
        base_supports.append(
            EpisodeSampler(base_train, opt, split="train", phase="train")
            if opt.n_base_support_samples > 0 else None)
    if any(b is None for b in base_supports):
        base_supports = None
    import time as _t
    print(f"[setup done t={_t.time() - _run_vmapped._t0:.1f}s]", flush=True)
    ms = few_shot_finetune_multiseed(
        backbone, variables_l, heads, metas, opts, samplers, base_tests,
        per_seed_base_support=base_supports, verbose=True,
        pallas_mode=args.pallas)
    return ms.per_seed


def _run_pretrain_vmapped(args, rest):
    """All seeds' backbone pretraining in one vmapped engine execution
    (engine/multiseed_pretrain.py) — the reference's Slurm array over
    train_supervised.py (slurm_run_backbone.sh:30-40) as one process: one
    staging pass, one compile, unified deterministic resume.  Measured on
    hardware (BASELINE.md): aggregate img/s on one chip EQUALS sequential
    single-seed runs (vmapped convs carry per-seed weights, so lanes cannot
    share MXU tiles); use --shard_seeds to lay the seed axis over a device
    mesh for true parallelism."""
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.config import parse_option_supervised
    from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
    from subspace_reg_tpu.engine.multiseed_pretrain import pretrain_multiseed
    from subspace_reg_tpu.models.factory import create_model
    from subspace_reg_tpu.models.head import Head
    from subspace_reg_tpu.utils.checkpoint import save_checkpoint

    opts, trains, vals = [], [], []
    for seed in args.seeds:
        argv = rest + ["--set_seed", str(seed)]
        if args.model_path_pattern:
            argv += ["--model_path",
                     args.model_path_pattern.format(seed=seed)]
        opt = parse_option_supervised(argv)
        if not args.model_path_pattern:
            # one fan-out root, per-seed subdirs (the Slurm script's
            # ${SLURM_ARRAY_TASK_ID} directory layout)
            opt.save_folder = os.path.join(opt.save_folder, f"seed_{seed}")
            os.makedirs(opt.save_folder, exist_ok=True)
        # lazy=True: per-seed continual splits are LazyRows views over ONE
        # pickle-cached array; the engine stages it in HBM once for all
        # seeds and keeps per-seed rows/labels as small device tables
        if opt.dataset == "miniImageNet" and opt.continual:
            trains.append(load_mini_imagenet(opt, split="train",
                                             phase="train", lazy=True))
            vals.append(load_mini_imagenet(opt, split="train", phase="val",
                                           lazy=True))
        elif opt.dataset in ("CIFAR-FS", "FC100") and opt.continual:
            from subspace_reg_tpu.data.cifar import load_cifar_continual
            trains.append(load_cifar_continual(opt, split="train",
                                               phase="train", lazy=True))
            vals.append(load_cifar_continual(opt, split="train",
                                             phase="val", lazy=True))
        elif opt.dataset == "tieredImageNet":
            # the tiered pretraining split is seed-independent, so every
            # lane shares the npz-cached host array and the engine stages
            # ONE device copy (eager-identity path); seeds differ only in
            # init/shuffle streams — exactly the reference's tiered
            # backbone array
            assert not getattr(opt, "augment_pretrain_wtrainb", False), (
                "--pretrain --vmap: train_b pooling (and its 200-class "
                "eval truncation) is single-seed only; drop --vmap or "
                "--augment_pretrain_wtrainb")
            from subspace_reg_tpu.data.tiered_imagenet import (
                load_tiered_imagenet)
            trains.append(load_tiered_imagenet(opt, partition="train",
                                               phase="train"))
            vals.append(load_tiered_imagenet(opt, partition="train",
                                             phase="val"))
        else:
            raise AssertionError(
                "--pretrain --vmap serves the backbone fan-outs "
                "(miniImageNet/CIFAR continual, tieredImageNet); other "
                "datasets/protocols run per seed via train_supervised.py "
                "(drop --vmap)")
        opts.append(opt)

    opt0 = opts[0]
    if opt0.dataset == "miniImageNet":
        n_cls = 80 if opt0.use_trainval else 60
    elif opt0.dataset == "tieredImageNet":
        n_cls = 448 if opt0.use_trainval else 351
    else:
        n_cls = 60   # CIFAR continual (train_supervised.py:64)
    backbone = create_model(opt0.model, n_cls, opt0, dataset=opt0.dataset,
                            dtype=jnp.bfloat16)

    def save_fn(i, epoch, hs, final):
        # reference checkpoint contract (train_supervised.py:186-201):
        # training_classes (= basec_map) + label2human, optimizer state for
        # --reload_path resume
        opt, split = opts[i], trains[i]
        meta = {"epoch": epoch}
        if opt.continual:   # train_supervised.py:318-321
            meta["training_classes"] = split.basec_map
            meta["label2human"] = split.label2human
        variables = {"params": hs.params["backbone"],
                     "batch_stats": hs.batch_stats,
                     "counters": hs.counters}
        b = (jnp.asarray(hs.params["head"]["b"])
             if opt.linear_bias else None)
        head = Head(weight=jnp.asarray(hs.params["head"]["w"]), bias=b,
                    n_active=jnp.asarray(n_cls, jnp.int32))
        name = (f"{opt.model}_last.ckpt" if final
                else f"ckpt_epoch_{epoch}.ckpt")
        save_checkpoint(os.path.join(opt.save_folder, name), variables,
                        head, meta,
                        extra={"opt_state": hs.opt_state, "step": hs.step})
        print(f"==> Saved {name} (seed {opt.set_seed})")

    start_states, start_epoch = None, 1
    if args.resume:
        from subspace_reg_tpu.engine.multiseed_pretrain import (
            load_resume_states)
        paths = []
        for opt in opts:
            last = os.path.join(opt.save_folder, f"{opt.model}_last.ckpt")
            # all candidates per seed: load_resume_states picks the one
            # with the highest checkpointed epoch (a stale _last must not
            # shadow newer ckpt_epoch_N progress)
            cands = ([last] if os.path.exists(last) else []) + [
                os.path.join(opt.save_folder, f)
                for f in os.listdir(opt.save_folder)
                if f.startswith("ckpt_epoch_")]
            assert cands, f"--resume: no checkpoint in {opt.save_folder}"
            paths.append(cands)
        img_size = trains[0].imgs.shape[1]
        start_states, start_epoch = load_resume_states(
            backbone, opts, n_cls, img_size, paths)
        print(f"==> resuming {len(paths)} seeds at epoch {start_epoch}")

    res = pretrain_multiseed(backbone, opts, trains, vals, n_cls,
                             save_fn=save_fn,
                             shard_over_devices=args.shard_seeds,
                             start_states=start_states,
                             start_epoch=start_epoch)

    # per-seed metric logs with the single-seed trainer's scalar names
    # (train_supervised.py:405-416; tb_path is shared in fan-out mode, so
    # each seed logs under its own save_folder)
    from subspace_reg_tpu.utils.logging import MetricWriter
    for i, opt in enumerate(opts):
        w = MetricWriter(os.path.join(opt.save_folder, "tb"))
        for ep0, (tm, vm) in enumerate(zip(res.train_metrics,
                                           res.val_metrics)):
            epoch = res.start_epoch + ep0
            w.log_value("train_acc", tm[i]["acc1"], epoch)
            w.log_value("train_loss", tm[i]["loss"], epoch)
            # aggregate across lanes (one program trains all seeds)
            w.log_value("images_per_sec", res.images_per_sec[ep0], epoch)
            w.log_value("test_acc", vm[i]["acc1"], epoch)
            w.log_value("test_acc_top5", vm[i]["acc5"], epoch)
            w.log_value("test_loss", vm[i]["loss"], epoch)
        w.close()
    return res


def main(argv=None):
    from subspace_reg_tpu.utils.jax_setup import configure as _jc
    _jc()
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, rest = argv[:split], argv[split + 1:]
    else:
        own, rest = argv, []
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="+",
                   default=list(range(1, 11)))
    p.add_argument("--model_path_pattern", type=str, default=None,
                   help="optional per-seed checkpoint pattern with {seed}")
    p.add_argument("--vmap", action="store_true",
                   help="batch all seeds through one vmapped engine run")
    p.add_argument("--pretrain", action="store_true",
                   help="fan out BACKBONE PRETRAINING over seeds (rest "
                        "args go to train_supervised); with --vmap all "
                        "seeds train in one vmapped program")
    p.add_argument("--shard_seeds", action="store_true",
                   help="with --pretrain --vmap: lay the seed axis over "
                        "a 1-D device mesh (pod-scale fan-out; the image "
                        "store replicates per chip)")
    p.add_argument("--resume", action="store_true",
                   help="with --pretrain --vmap: resume every seed from "
                        "its latest checkpoint (params, BN stats, "
                        "optimizer state and shuffle stream restored — "
                        "the resumed trajectory equals the uninterrupted "
                        "one)")
    p.add_argument("--pallas", type=str, default="auto",
                   choices=("auto", "on", "off", "interpret"),
                   help="fused fine-tune kernel mode for the vmapped "
                        "engine (auto: kernel on TPU, XLA elsewhere)")
    p.add_argument("--seed_batch", type=int, default=None,
                   help="process seeds in vmapped groups of this size "
                        "(bounds HBM: the epoch-1 train-mode forwards keep "
                        "several (S*batch, 84, 84, 64) activations live and "
                        "cannot be chunked without changing BN batch-stat "
                        "semantics)")
    args = p.parse_args(own)

    if args.pretrain:
        out = {"seeds": args.seeds, "val_acc1": {}}
        if args.vmap:
            import copy as _copy
            import time as _time
            group = args.seed_batch or len(args.seeds)
            for lo in range(0, len(args.seeds), group):
                gargs = _copy.copy(args)
                gargs.seeds = args.seeds[lo:lo + group]
                if len(args.seeds) > group:
                    print(f"===== vmapped pretrain group {gargs.seeds} "
                          f"=====", flush=True)
                g0 = _time.time()
                res = _run_pretrain_vmapped(gargs, rest)
                ips = (f"{np.mean(res.images_per_sec):.0f} img/s"
                       if res.images_per_sec else "no epochs ran")
                print(f"[group {gargs.seeds} wall "
                      f"{_time.time() - g0:.1f}s; aggregate {ips}]",
                      flush=True)
                # a nothing-to-do resume (checkpoints already at
                # --epochs) has no val pass to report
                if res.val_metrics:
                    for s, vm in zip(gargs.seeds, res.val_metrics[-1]):
                        out["val_acc1"][s] = vm["acc1"]
        else:
            import train_supervised
            for seed in args.seeds:
                seed_argv = rest + ["--set_seed", str(seed)]
                if args.model_path_pattern:
                    seed_argv += ["--model_path",
                                  args.model_path_pattern.format(seed=seed)]
                elif "--model_path" in rest:
                    # per-seed subdirs so sequential runs don't clobber
                    # each other's <model>_last.ckpt
                    mp = rest[rest.index("--model_path") + 1]
                    seed_argv += ["--model_path",
                                  os.path.join(mp, f"seed_{seed}")]
                else:
                    raise SystemExit(
                        "--pretrain needs --model_path_pattern or a "
                        "--model_path after -- (per-seed checkpoints "
                        "would otherwise collide)")
                print(f"===== pretrain seed {seed} =====", flush=True)
                train_supervised.main(seed_argv)
        print(json.dumps(out, indent=2, default=float))
        return out

    novel_all, base_all, weighted_all = [], [], []
    if args.vmap:
        import copy as _copy
        all_seeds = list(args.seeds)
        group = args.seed_batch or len(all_seeds)
        results = []
        import time as _time
        for lo in range(0, len(all_seeds), group):
            gargs = _copy.copy(args)
            gargs.seeds = all_seeds[lo:lo + group]
            if len(all_seeds) > group:
                print(f"===== vmapped seed group {gargs.seeds} =====",
                      flush=True)
            g0 = _time.time()
            results.extend(_run_vmapped(gargs, rest))
            print(f"[group {gargs.seeds} wall {_time.time() - g0:.1f}s]",
                  flush=True)
        for res in results:
            novel_all.append(res.acc_novel_avg)
            base_all.append(res.acc_base_avg)
            weighted_all.append(res.weighted_avg_l)
    else:
        import eval_incremental
        for seed in args.seeds:
            seed_argv = rest + ["--set_seed", str(seed)]
            if args.model_path_pattern:
                seed_argv += ["--model_path",
                              args.model_path_pattern.format(seed=seed)]
            print(f"===== seed {seed} =====")
            res = eval_incremental.main(seed_argv)
            novel_all.append(res.acc_novel_avg)
            base_all.append(res.acc_base_avg)
            weighted_all.append(res.weighted_avg_l)

    from subspace_reg_tpu.utils.artifacts import mean_confidence_interval
    out = {"seeds": args.seeds}
    if len(novel_all) > 1:
        mn, hn = mean_confidence_interval(novel_all)
        mb, hb = mean_confidence_interval(base_all)
        out["novel"] = {"mean": mn, "ci95": hn}
        out["base"] = {"mean": mb, "ci95": hb}
    else:
        out["novel"] = {"mean": novel_all[0]}
        out["base"] = {"mean": base_all[0]}
    out["weighted_traces"] = weighted_all
    print(json.dumps(out, indent=2, default=float))
    return out


if __name__ == "__main__":
    main()
