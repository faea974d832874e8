#!/usr/bin/env python
"""Incremental FSCIL evaluation CLI — flag-compatible counterpart of the
reference entry point (eval_incremental.py:24-140).

Usage mirrors scripts/continual/slurm_subspace_reg.sh:

  python eval_incremental.py --model_path backbone.pth --model resnet18 \
      --no_dropblock --data_root data --n_shots 5 --classifier linear \
      --eval_mode few-shot-incremental-fine-tune --min_novel_epochs 20 \
      --learning_rate 0.002 --freeze_backbone_at 1 \
      --test_base_batch_size 2000 --continual --n_queries 25 \
      --lmbd_reg_transform_w 0.2 --target_train_loss 0.0 \
      --label_pull 1.0 --lmbd_reg_novel 0.1 --set_seed 1 \
      --attraction_override distance2subspace \
      --n_base_support_samples 1 --memory_replay 1
"""

import sys
import time

import numpy as np

from subspace_reg_tpu.config import parse_option_eval, MAX_SESSIONS
from subspace_reg_tpu.data.episodes import EpisodeSampler
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.engine.incremental import few_shot_finetune_incremental_test
from subspace_reg_tpu.models.factory import create_model
from subspace_reg_tpu.utils.checkpoint import load_any


def main(argv=None):
    opt = parse_option_eval(argv)

    from subspace_reg_tpu.utils.jax_setup import configure as jax_configure
    jax_configure()   # persistent compile cache + TPU hardware RNG

    np.random.seed(opt.set_seed)

    print("************* Training arguments *************")
    for k, v in vars(opt).items():
        print(k, v)
    print("End of arguments.\n")

    if opt.dataset == "miniImageNet":
        # base test samples: base classes, unused-in-training samples
        # (reference eval_incremental.py:53-57)
        base_test = load_mini_imagenet(opt, split="train", phase="test")
        base_train = (load_mini_imagenet(opt, split="train", phase="train")
                      if opt.n_base_support_samples > 0 else None)
        novel = load_mini_imagenet(opt, split="val")
        n_cls = 80 if opt.use_trainval else (60 if opt.continual else 64)
    elif opt.dataset in ("CIFAR-FS", "FC100"):
        # the reference raises here (eval_incremental.py:82-83); we wire the
        # CIFAR continual protocol end-to-end (SURVEY.md §7 step 8)
        from subspace_reg_tpu.data.cifar import load_cifar_continual
        base_test = load_cifar_continual(opt, split="train", phase="test")
        base_train = (load_cifar_continual(opt, split="train", phase="train")
                      if opt.n_base_support_samples > 0 else None)
        novel = load_cifar_continual(opt, split="val")
        opt.transform = "D"
        n_cls = 60
    elif opt.dataset == "tieredImageNet":
        # the reference raises for tiered (eval_incremental.py:83) yet its
        # engine carries the tiered weighting (language_eval.py:383); we wire
        # it end-to-end: base = 351-class train_a partition with its
        # train/val/test phase split (dataset/tiered_imagenet.py:24-35),
        # novel episodes from the class-disjoint val partition
        from subspace_reg_tpu.data.tiered_imagenet import load_tiered_imagenet
        base_test = load_tiered_imagenet(opt, partition="train", phase="test")
        base_train = (load_tiered_imagenet(opt, partition="train",
                                           phase="train")
                      if opt.n_base_support_samples > 0 else None)
        novel = load_tiered_imagenet(opt, partition="val", pretrain=False)
        n_cls = 448 if opt.use_trainval else 351
    else:
        raise NotImplementedError(opt.dataset)

    base_support_sampler = None
    if base_train is not None:
        base_support_sampler = EpisodeSampler(
            base_train, opt, split="train", phase="train")

    # disjoint_classes=True unconditionally — the reference CLI hardcodes it
    # for miniImageNet even without --continual (eval_incremental.py:75);
    # random (non-disjoint) episodes remain a library capability
    # (EpisodeSampler(disjoint_classes=False), tests/test_protocols.py)
    meta_sampler = EpisodeSampler(novel, opt, split="val",
                                  use_episodes=opt.use_episodes,
                                  disjoint_classes=True)

    # session / episode count: the reference hardcodes 8
    # (eval_incremental.py:123, language_eval.py:132-136).  An explicitly
    # passed --neval_episodes (!= the 2000 parser default, configs.py:60 —
    # a dead default upstream) overrides, bounded by the novel split's class
    # budget since the disjoint sampler consumes 5 classes per session.
    n_novel_classes = len(set(novel.labels))
    budget = n_novel_classes // opt.n_ways
    if opt.neval_episodes == 2000:
        opt.neval_episodes = MAX_SESSIONS
    if opt.neval_episodes > budget:
        print(f"==> clamping sessions to the novel class budget: "
              f"{budget} ({n_novel_classes} classes / {opt.n_ways}-way)")
        opt.neval_episodes = budget
    from subspace_reg_tpu.engine.incremental import session_count
    n_sessions = session_count(opt)

    max_classes = n_cls + n_sessions * opt.n_ways
    variables, head, meta = load_any(opt.model_path, max_classes=max_classes)

    # linear bias inferred from checkpoint (eval_incremental.py:99-105)
    assert opt.classifier == "linear"
    opt.linear_bias = bool(meta.get("has_bias", head.bias is not None))

    backbone = create_model(opt.model, n_cls, opt, dataset=opt.dataset)

    # counters collection for the dropblock schedule
    if "counters" not in variables:
        import jax
        import jax.numpy as jnp
        init_vars = backbone.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, base_test.imgs.shape[1], base_test.imgs.shape[2], 3)),
            train=False)
        variables = dict(variables)
        variables["counters"] = init_vars["counters"]

    opt.split = "val"

    start = time.time()
    result = few_shot_finetune_incremental_test(
        backbone, variables, head, meta, opt,
        meta_sampler=meta_sampler,
        base_test_split=base_test,
        base_support_sampler=base_support_sampler)
    val_time = time.time() - start

    print("val_acc_novel: {:.4f}, std: {:.4f}, time: {:.1f}".format(
        result.acc_novel_avg, 0, val_time))
    print("val_acc_base: {:.4f}, std: {:.4f}, time: {:.1f}".format(
        result.acc_base_avg, 0, val_time))
    print("val_acc_average: {:.4f}".format(result.acc_average))
    return result


if __name__ == "__main__":
    main()
