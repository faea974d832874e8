#!/usr/bin/env python
"""Execute tools/parity_gate.py end-to-end against a synthesized fixture.

The real miniImageNet ``all.pickle`` and the published .pth backbones are
not present in this environment, so the ±0.5%/session gate cannot run on
the real assets; this driver proves the gate's FULL code path anyway —
checkpoint discovery, the four golden configs
(scripts/continual/slurm_*.sh), mapping training, reference-stdout trace
parsing, and the tolerance verdict — by synthesizing every asset in the
reference's own on-disk formats and running the gate twice on hardware:

  1. synthesize miniImageNet (all.pickle + class_labels.txt, full 500/50
     continual geometry) and word-embed pickles;
  2. pretrain a resnet18 backbone (train_supervised CLI) and export it to
     the reference's .pth interchange format with tools/export_pth.py
     (reference slurm layout backbones/continual/resnet18/<seed>/);
  3. run the gate in record mode (no --expected_dir) and write its traces
     as reference-format stdout files (eval/language_eval.py:451-453
     print lines);
  4. run the gate again in compare mode against those recorded .out files
     — exercising parse_reference_out and the verdict; passes iff the two
     independent executions agree within ±tolerance on every session.

Usage (defaults reproduce the committed parity_report.json):

  python tools/run_parity_gate_fixture.py \
      [--work_dir /tmp/parity_fixture] [--img_size 84] [--epochs 2] \
      [--seeds 1] [--out parity_report.json]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)


def _fmt_trace(vals):
    return "[" + ", ".join(f"{v:.4f}" for v in vals) + "]"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work_dir", default="/tmp/parity_fixture")
    p.add_argument("--img_size", type=int, default=84)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--seeds", nargs="+", type=int, default=[1])
    p.add_argument("--configs", nargs="+", default=None)
    p.add_argument("--tolerance", type=float, default=0.5)
    p.add_argument("--out", default="parity_report.json")
    p.add_argument("--fresh", action="store_true",
                   help="wipe work_dir first")
    args = p.parse_args(argv)

    import parity_gate
    from subspace_reg_tpu.data import synthetic

    if args.fresh and os.path.isdir(args.work_dir):
        shutil.rmtree(args.work_dir)
    os.makedirs(args.work_dir, exist_ok=True)
    data_root = os.path.join(args.work_dir, "data")
    embeds_dir = os.path.join(args.work_dir, "word_embeds")
    backbones = os.path.join(args.work_dir, "backbones",
                             "continual", "resnet18")
    expected = os.path.join(args.work_dir, "reference_outputs")
    configs = args.configs or list(parity_gate.CONFIGS)

    # ---- 1. assets in the reference's formats --------------------------
    mini_root = os.path.join(data_root, "miniImageNet")
    if not os.path.exists(os.path.join(mini_root, "all.pickle")):
        print("==> synthesizing miniImageNet "
              f"(100 cls x 560 @ {args.img_size}px, 500/50 continual split)")
        t0 = time.time()
        synthetic.make_mini_imagenet(mini_root, n_classes=100,
                                     per_class=560,
                                     img_size=args.img_size, seed=0)
        print(f"    {time.time() - t0:.1f}s")
    if not os.path.exists(
            os.path.join(embeds_dir, "miniImageNet_dim500.pickle")):
        synthetic.make_word_embeds(embeds_dir, n_classes=100)

    # ---- 2. backbones: pretrain + export to .pth -----------------------
    import export_pth
    import train_supervised
    for seed in args.seeds:
        pth = os.path.join(backbones, str(seed), "resnet18_last.pth")
        if os.path.exists(pth):
            continue
        save = os.path.join(args.work_dir, f"pretrain_seed_{seed}")
        ckpts = glob.glob(os.path.join(save, "**", "resnet18_last.ckpt"),
                          recursive=True)
        if not ckpts:
            print(f"==> pretraining backbone seed {seed} "
                  f"({args.epochs} epochs)")
            # dropblock geometry is defined at the reference's 84px
            # (models/util.py:21-31); smaller smoke sizes underflow it
            dropblock = ([] if args.img_size >= 84 else ["--no_dropblock"])
            train_supervised.main([
                "--dataset", "miniImageNet", "--model", "resnet18",
                "--classifier", "linear", "--continual",
                "--no_linear_bias", *dropblock,
                "--data_root", data_root,
                "--model_path", save,
                "--tb_path", os.path.join(save, "tb"),
                "--epochs", str(args.epochs), "--batch_size", "64",
                "--set_seed", str(seed), "--num_workers", "0",
            ])
            ckpts = glob.glob(os.path.join(save, "**",
                                           "resnet18_last.ckpt"),
                              recursive=True)
        assert ckpts, f"pretraining produced no checkpoint under {save}"
        os.makedirs(os.path.dirname(pth), exist_ok=True)
        print(f"==> exporting {ckpts[0]} -> {pth}")
        export_pth.main(["--ckpt", ckpts[0], "--out", pth])

    # ---- 3. record pass: gate without expected_dir ---------------------
    rec_out = os.path.join(args.work_dir, "parity_record.json")
    print("\n==> parity gate: RECORD pass")
    rc = parity_gate.main([
        "--data_root", data_root, "--backbones_dir", backbones,
        "--word_embed_path", embeds_dir,
        "--configs", *configs,
        "--seeds", *[str(s) for s in args.seeds],
        "--tolerance", str(args.tolerance), "--out", rec_out])
    assert rc == 0, "record pass failed"

    # write the recorded traces as reference-format stdout files so the
    # compare pass exercises parse_reference_out on the real print shapes
    # (eval/language_eval.py:451-453)
    os.makedirs(expected, exist_ok=True)
    with open(rec_out) as f:
        recorded = json.load(f)
    for run in recorded["runs"]:
        ours = run["ours"]
        path = os.path.join(expected,
                            f"{run['config']}_seed_{run['seed']}.out")
        with open(path, "w") as f:
            f.write("************* Training arguments *************\n"
                    "... (recorded by run_parity_gate_fixture)\n"
                    "Overall continual accuracies:  "
                    f"{_fmt_trace(ours['overall'])}\n"
                    "Novel only incremental:  "
                    f"{_fmt_trace(ours['novel'])}\n"
                    "Base only incremental:  "
                    f"{_fmt_trace(ours['base'])}\n")

    # ---- 4. compare pass: full gate verdict ----------------------------
    print("\n==> parity gate: COMPARE pass")
    rc = parity_gate.main([
        "--data_root", data_root, "--backbones_dir", backbones,
        "--expected_dir", expected,
        "--word_embed_path", embeds_dir,
        "--configs", *configs,
        "--seeds", *[str(s) for s in args.seeds],
        "--tolerance", str(args.tolerance), "--out", args.out])

    # annotate the committed report with fixture provenance
    with open(args.out) as f:
        report = json.load(f)
    import jax
    report["fixture"] = {
        "synthetic_miniImageNet": {"n_classes": 100, "per_class": 560,
                                   "img_size": args.img_size},
        "backbone": f"resnet18, {args.epochs} pretrain epochs, exported "
                    "via tools/export_pth.py (.pth interchange)",
        "expected_source": "reference-format stdout recorded from an "
                           "independent first execution (record pass)",
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nfixture report: {args.out} (rc={rc})")
    return rc


if __name__ == "__main__":
    sys.exit(main())
