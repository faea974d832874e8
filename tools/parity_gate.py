#!/usr/bin/env python
"""One-command ±0.5%/session parity gate against recorded reference runs.

The BASELINE north star asks for per-session top-1 within ±0.5% of the
PyTorch reference across the miniImageNet session trace
(/root/reference/README.md:20, scripts/continual/*.sh).  The real
miniImageNet pickles and the published .pth backbones are not present in
this environment, so the gate cannot be *executed* here — this tool makes
it a single command the moment the assets appear:

  python tools/parity_gate.py \
      --data_root /path/with/all.pickle \
      --backbones_dir /path/backbones/continual/resnet18 \
      --expected_dir /path/reference_outputs \
      [--configs subspace_reg semantic_subspace_reg fine_tune linear_mapping] \
      [--seeds 1 2 3] [--tolerance 0.5] [--out parity_report.json]

Layout expectations (matching the reference's Slurm scripts):
  * ``backbones_dir/<seed>/resnet18_last.pth`` — published pretrained
    backbones (reference scripts/continual/slurm_subspace_reg.sh:16);
  * ``expected_dir/<config>_seed_<seed>.out`` — captured stdout of the
    reference run (it prints ``Overall continual accuracies: [..]``,
    ``Novel only incremental: [..]``, ``Base only incremental: [..]``,
    eval/language_eval.py:451-453), or ``.json`` files with keys
    {"overall": [9], "novel": [8], "base": [8]}.

For each (config, seed) the tool runs our eval_incremental CLI in-process
with the exact golden hyperparameters (scripts/continual/*.sh), parses both
traces, and reports the max per-session deviation.  Exit code 0 iff every
deviation is within tolerance.

The ``linear_mapping`` config automatically trains and caches the
``mapping_linear_label2image`` checkpoint via tools/learn_mapping.py
(reference learn_mapping.py:41-76) when missing.
"""

import argparse
import ast
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# golden hyperparameters, verbatim from scripts/continual/*.sh (which
# mirror the reference's slurm_*.sh)
_COMMON = [
    "--model", "resnet18", "--no_dropblock", "--n_shots", "5",
    "--classifier", "linear",
    "--eval_mode", "few-shot-incremental-fine-tune",
    "--min_novel_epochs", "20", "--freeze_backbone_at", "1",
    "--test_base_batch_size", "2000", "--continual", "--num_workers", "0",
    "--n_queries", "25", "--target_train_loss", "0.0",
    "--n_base_support_samples", "1", "--memory_replay", "1",
]

CONFIGS = {
    # slurm_fine_tune.sh:35-55 (wd 5e-3)
    "fine_tune": ["--learning_rate", "0.002", "--lmbd_reg_transform_w",
                  "0.2", "--lmbd_reg_novel", "0.1",
                  "--weight_decay", "5e-3"],
    # slurm_subspace_reg.sh:33-54
    "subspace_reg": ["--learning_rate", "0.002", "--lmbd_reg_transform_w",
                     "0.2", "--lmbd_reg_novel", "0.1", "--label_pull",
                     "1.0", "--attraction_override", "distance2subspace"],
    # slurm_semantic_subspace_reg.sh:36-59 (wd 5e-4)
    "semantic_subspace_reg": ["--learning_rate", "0.002",
                              "--lmbd_reg_transform_w", "0.2",
                              "--lmbd_reg_novel", "0.1", "--label_pull",
                              "0.2", "--glove", "--temperature", "3.0",
                              "--weight_decay", "5e-4"],
    # slurm_linear_mapping.sh:34-56 (--glove at :53 — the mapping is
    # trained on the 300-d GloVe slice, so eval must slice to match)
    "linear_mapping": ["--learning_rate", "0.002",
                       "--lmbd_reg_transform_w", "0.2",
                       "--lmbd_reg_novel", "0.1", "--label_pull", "0.1",
                       "--glove", "--attraction_override",
                       "mapping_linear_label2image"],
}


def parse_reference_out(text):
    """Extract the three printed traces from reference stdout
    (eval/language_eval.py:451-453)."""
    out = {}
    for key, tag in (("overall", "Overall continual accuracies"),
                     ("novel", "Novel only incremental"),
                     ("base", "Base only incremental")):
        m = re.search(re.escape(tag) + r"\s*:\s*(\[[^\]]*\])", text)
        if not m:
            raise ValueError(f"trace '{tag}' not found in reference output")
        out[key] = [float(v) for v in ast.literal_eval(m.group(1))]
    return out


def load_expected(expected_dir, config, seed):
    stem = os.path.join(expected_dir, f"{config}_seed_{seed}")
    if os.path.exists(stem + ".json"):
        with open(stem + ".json") as f:
            d = json.load(f)
        return {k: [float(v) for v in d[k]]
                for k in ("overall", "novel", "base")}
    for ext in (".out", ".txt", ".log"):
        if os.path.exists(stem + ext):
            with open(stem + ext) as f:
                return parse_reference_out(f.read())
    raise FileNotFoundError(f"no expected trace for {config} seed {seed} "
                            f"under {expected_dir} ({stem}.json/.out)")


def backbone_path(backbones_dir, seed, config, word_embed_path=None):
    name = ("resnet18_last_with_mapping.pth"
            if config == "linear_mapping" else "resnet18_last.pth")
    cand = os.path.join(backbones_dir, str(seed), name)
    if config == "linear_mapping" and not os.path.exists(cand):
        src = os.path.join(backbones_dir, str(seed), "resnet18_last.pth")
        print(f"==> training linear mapping for seed {seed} "
              f"({src} -> {cand})")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from learn_mapping import main as learn_mapping_main
        lm_argv = ["--model_path", src, "--save_path", cand]
        if word_embed_path:
            lm_argv += ["--word_embed_path", word_embed_path]
        learn_mapping_main(lm_argv)
    # native-format fallbacks produced by our own pretraining
    if not os.path.exists(cand):
        for alt in ("resnet18_last.ckpt", "resnet18_last"):
            p = os.path.join(backbones_dir, str(seed), alt)
            if os.path.exists(p):
                return p
    return cand


def run_config(config, seed, data_root, backbones_dir, word_embed_path):
    import eval_incremental
    argv = list(_COMMON) + CONFIGS[config] + [
        "--model_path",
        backbone_path(backbones_dir, seed, config, word_embed_path),
        "--data_root", data_root, "--set_seed", str(seed),
    ]
    if word_embed_path:
        argv += ["--word_embed_path", word_embed_path]
    result = eval_incremental.main(argv)
    return {"overall": [float(v) for v in result.weighted_avg_l],
            "novel": [float(v) for v in result.acc_novel_list],
            "base": [float(v) for v in result.acc_base_list]}


def compare(ours, ref, tolerance):
    rows = []
    ok = True
    for key in ("overall", "novel", "base"):
        a, b = ours[key], ref[key]
        if len(a) != len(b):
            rows.append({"trace": key, "error":
                         f"length mismatch ours={len(a)} ref={len(b)}"})
            ok = False
            continue
        devs = [abs(x - y) for x, y in zip(a, b)]
        worst = max(devs) if devs else 0.0
        rows.append({"trace": key, "ours": a, "ref": b,
                     "max_abs_dev": worst, "within": worst <= tolerance})
        ok = ok and worst <= tolerance
    return ok, rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--backbones_dir", required=True)
    p.add_argument("--expected_dir", default=None,
                   help="recorded reference outputs; omit to only run and "
                        "record our traces")
    p.add_argument("--word_embed_path", default=None)
    p.add_argument("--configs", nargs="+", default=list(CONFIGS),
                   choices=list(CONFIGS))
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    p.add_argument("--tolerance", type=float, default=0.5)
    p.add_argument("--out", default="parity_report.json")
    args = p.parse_args(argv)

    report = {"tolerance": args.tolerance, "runs": [], "all_within": True}
    for config in args.configs:
        for seed in args.seeds:
            print(f"\n===== {config} seed {seed} =====")
            ours = run_config(config, seed, args.data_root,
                              args.backbones_dir, args.word_embed_path)
            entry = {"config": config, "seed": seed, "ours": ours}
            if args.expected_dir:
                ref = load_expected(args.expected_dir, config, seed)
                ok, rows = compare(ours, ref, args.tolerance)
                entry["comparison"] = rows
                entry["within_tolerance"] = ok
                report["all_within"] = report["all_within"] and ok
                print(f"  -> {'WITHIN' if ok else 'EXCEEDS'} "
                      f"±{args.tolerance}%")
            report["runs"].append(entry)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nreport: {args.out}")
    if args.expected_dir and not report["all_within"]:
        print("PARITY GATE FAILED")
        return 1
    print("PARITY GATE " + ("PASSED" if args.expected_dir
                            else "RECORDED (no expected_dir given)"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
