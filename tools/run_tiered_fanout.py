#!/usr/bin/env python
"""10-seed tieredImageNet FSCIL fan-out on the fused kernel, on hardware.

The one composition never exercised on the chip before round 5: the
tiered Cp=512-padded (392 after 8-alignment) VMEM-diet fine-tune kernel
geometry x vmapped seed lanes.  Mirrors the round-2 miniImageNet 10-seed
golden fan-out protocol (BASELINE.md "Vmapped multi-seed engine on
hardware") at tiered geometry: 351 base classes, novel sessions from the
class-disjoint val partition, w1=200 session weighting
(reference eval/language_eval.py:383).

Steps:
  1. synthesize tieredImageNet at the reference's 84px in the reference's
     npz/pkl schemas (dataset/tiered_imagenet.py:42-56);
  2. pretrain a resnet12 backbone (351-way, train_supervised CLI,
     reference-contract checkpoint);
  3. run tools/run_seeds.py --vmap --pallas auto over seeds 1..10 in
     HBM-sized groups with the golden subspace-reg+M flags
     (scripts/continual/slurm_subspace_reg.sh hyperparameters).

Usage:
  python tools/run_tiered_fanout.py [--work_dir /tmp/tiered_fanout]
      [--per_class 40] [--epochs 1] [--seed_batch 5]
      [--seeds 1 ... 10] [--out tiered_fanout.json]
"""

import argparse
import glob
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default="/tmp/tiered_fanout")
    p.add_argument("--img_size", type=int, default=84)
    p.add_argument("--per_class", type=int, default=40)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--seed_batch", type=int, default=5)
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    p.add_argument("--pallas", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--out", default="tiered_fanout.json")
    args = p.parse_args(argv)

    import run_seeds
    from subspace_reg_tpu.data import synthetic

    os.makedirs(args.work_dir, exist_ok=True)
    data_root = os.path.join(args.work_dir, "data")
    tiered_root = os.path.join(data_root, "tieredImageNet")

    # ---- 1. synthetic tiered assets at 84px ----------------------------
    if not os.path.exists(os.path.join(tiered_root,
                                       "train_a_train_a_phase_train_images"
                                       ".npz")):
        print(f"==> synthesizing tieredImageNet (351 cls x "
              f"{args.per_class} @ {args.img_size}px)", flush=True)
        t0 = time.time()
        synthetic.make_tiered(tiered_root, n_classes=351,
                              per_class=args.per_class,
                              img_size=args.img_size, seed=0)
        print(f"    {time.time() - t0:.1f}s", flush=True)

    # ---- 2. backbone: 351-way resnet12 pretrain ------------------------
    save = os.path.join(args.work_dir, "pretrain")
    ckpts = glob.glob(os.path.join(save, "**", "resnet12_last.ckpt"),
                      recursive=True)
    if not ckpts:
        import train_supervised
        print(f"==> pretraining resnet12 ({args.epochs} epochs, 351-way)",
              flush=True)
        t0 = time.time()
        train_supervised.main([
            "--dataset", "tieredImageNet", "--model", "resnet12",
            "--classifier", "linear", "--no_linear_bias",
            "--data_root", data_root, "--model_path", save,
            "--tb_path", os.path.join(save, "tb"),
            "--epochs", str(args.epochs), "--batch_size", "64",
            "--set_seed", "1", "--num_workers", "0",
        ])
        print(f"    pretrain wall {time.time() - t0:.1f}s", flush=True)
        ckpts = glob.glob(os.path.join(save, "**", "resnet12_last.ckpt"),
                          recursive=True)
    assert ckpts, f"no checkpoint under {save}"

    # ---- 3. vmapped 10-seed fan-out (golden subspace-reg+M flags) ------
    t0 = time.time()
    res = run_seeds.main([
        "--vmap", "--pallas", args.pallas,
        "--seed_batch", str(args.seed_batch),
        "--seeds", *[str(s) for s in args.seeds],
        "--model_path_pattern", ckpts[0], "--",
        "--dataset", "tieredImageNet", "--continual",
        "--model", "resnet12", "--no_dropblock",
        "--data_root", data_root, "--n_shots", "5", "--n_queries", "25",
        "--classifier", "linear",
        "--eval_mode", "few-shot-incremental-fine-tune",
        "--test_base_batch_size", "2000", "--memory_replay", "1",
        "--n_base_support_samples", "1",
        "--lmbd_reg_transform_w", "0.2", "--lmbd_reg_novel", "0.1",
        "--label_pull", "1.0", "--attraction_override",
        "distance2subspace",
        "--learning_rate", "0.002", "--weight_decay", "5e-3",
        "--min_novel_epochs", "20", "--target_train_loss", "0.0",
        "--freeze_backbone_at", "1", "--num_workers", "0",
    ])
    wall = time.time() - t0

    import jax
    out = {"result": res, "fanout_wall_s": wall,
           "seed_batch": args.seed_batch, "pallas": args.pallas,
           "fixture": {"dataset": "synthetic tieredImageNet",
                       "n_classes": 351, "per_class": args.per_class,
                       "img_size": args.img_size,
                       "backbone": f"resnet12, {args.epochs} epochs"},
           "device": str(jax.devices()[0])}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(f"\ntiered fan-out: {len(args.seeds)} seeds, wall {wall:.1f}s "
          f"-> {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
