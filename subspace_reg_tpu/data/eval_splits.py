"""Shared dataset dispatch + session budget for the incremental-eval
surfaces — ONE implementation behind both ``eval_incremental.py`` and the
multi-seed fan-out (`tools/run_seeds.py --vmap`), so their loader/clamp
semantics cannot drift (they did, twice, when the fan-out carried a hand
copy).

Reference semantics being mirrored: eval_incremental.py:44-107 (loader
dispatch per dataset; the reference raises for CIFAR/tiered — those are
wired end-to-end here) and eval_incremental.py:123 +
eval/language_eval.py:132-136 (the hardcoded 8 sessions; the 2000
``neval_episodes`` parser default is dead upstream, configs.py:60).
"""

from __future__ import annotations

from .mini_imagenet import load_mini_imagenet


def load_eval_splits(opt, lazy: bool = False):
    """Load (base_test, base_train, novel, n_cls) for the FSCIL protocol
    and clamp ``opt.neval_episodes`` to the novel class budget.

    ``base_train`` is None when ``n_base_support_samples == 0`` (the
    single-seed CLI's gate — for tiered this skips reading the largest
    npz archive entirely).  ``lazy=True`` returns LazyRows views over the
    shared pickle arrays where supported (mini/CIFAR; the multi-seed
    fan-out's device-staging contract).  Mutates ``opt``:
    ``neval_episodes`` (clamp) and ``transform`` (CIFAR -> 'D').
    """
    if opt.dataset == "miniImageNet":
        # base test samples: base classes, unused-in-training samples
        # (reference eval_incremental.py:53-57)
        base_test = load_mini_imagenet(opt, split="train", phase="test",
                                       lazy=lazy)
        base_train = (load_mini_imagenet(opt, split="train", phase="train",
                                         lazy=lazy)
                      if opt.n_base_support_samples > 0 else None)
        novel = load_mini_imagenet(opt, split="val", lazy=lazy)
        n_cls = 80 if opt.use_trainval else (60 if opt.continual else 64)
    elif opt.dataset in ("CIFAR-FS", "FC100"):
        # the reference raises here (eval_incremental.py:82-83); we wire
        # the CIFAR continual protocol end-to-end (SURVEY.md §7 step 8)
        from .cifar import load_cifar_continual
        base_test = load_cifar_continual(opt, split="train", phase="test",
                                         lazy=lazy)
        base_train = (load_cifar_continual(opt, split="train",
                                           phase="train", lazy=lazy)
                      if opt.n_base_support_samples > 0 else None)
        novel = load_cifar_continual(opt, split="val", lazy=lazy)
        opt.transform = "D"
        n_cls = 60
    elif opt.dataset == "tieredImageNet":
        # the reference raises for tiered (eval_incremental.py:83) yet its
        # engine carries the tiered weighting (language_eval.py:383); we
        # wire it end-to-end: base = 351-class train_a partition with its
        # train/val/test phase split (dataset/tiered_imagenet.py:24-35),
        # novel episodes from the class-disjoint val partition
        from .tiered_imagenet import load_tiered_imagenet
        base_test = load_tiered_imagenet(opt, partition="train",
                                         phase="test")
        base_train = (load_tiered_imagenet(opt, partition="train",
                                           phase="train")
                      if opt.n_base_support_samples > 0 else None)
        novel = load_tiered_imagenet(opt, partition="val", pretrain=False)
        n_cls = 448 if opt.use_trainval else 351
    else:
        raise NotImplementedError(opt.dataset)

    # session / episode count: the reference hardcodes 8
    # (eval_incremental.py:123, language_eval.py:132-136).  An explicitly
    # passed --neval_episodes (!= the 2000 parser default, configs.py:60 —
    # a dead default upstream) overrides, bounded by the novel split's
    # class budget since the disjoint sampler consumes n_ways classes per
    # session.
    from ..config import MAX_SESSIONS
    n_novel_classes = len(set(novel.labels))
    budget = n_novel_classes // opt.n_ways
    if opt.neval_episodes == 2000:
        opt.neval_episodes = MAX_SESSIONS
    if opt.neval_episodes > budget:
        print(f"==> clamping sessions to the novel class budget: "
              f"{budget} ({n_novel_classes} classes / {opt.n_ways}-way)")
        opt.neval_episodes = budget

    return base_test, base_train, novel, n_cls
