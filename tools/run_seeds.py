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
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
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
    args = p.parse_args(own)

    import eval_incremental

    novel_all, base_all, weighted_all = [], [], []
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
