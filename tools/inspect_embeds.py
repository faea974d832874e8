#!/usr/bin/env python
"""Embedding-asset inspector — script counterpart of the reference's
pool_embeds.ipynb exploration notebook (loads the BERT description pickle /
word-embed pickle and reports per-class coverage and geometry)."""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", help="embedding pickle ({word|class: vector})")
    p.add_argument("--vocab", nargs="*", default=None,
                   help="labels to resolve through get_embeds")
    p.add_argument("--dim", type=int, default=500)
    args = p.parse_args(argv)

    with open(args.path, "rb") as f:
        d = pickle.load(f)
    keys = list(d.keys())
    vecs = np.stack([np.asarray(d[k], np.float32).ravel() for k in keys[:2000]])
    print(f"{len(keys)} entries; dim={vecs.shape[1]}")
    norms = np.linalg.norm(vecs, axis=1)
    print(f"norms: mean={norms.mean():.3f} std={norms.std():.3f} "
          f"min={norms.min():.3f} max={norms.max():.3f}")
    zeros = int((norms == 0).sum())
    if zeros:
        print(f"WARNING: {zeros} zero vectors")
    print("sample keys:", keys[:8])

    if args.vocab:
        from subspace_reg_tpu.models.embeds import get_embeds
        e = get_embeds(args.path, args.vocab, args.dim)
        cov = [(lbl, float(np.linalg.norm(v))) for lbl, v in zip(args.vocab, e)]
        for lbl, n in cov:
            flag = "  (OOV -> zero)" if n == 0 else ""
            print(f"  {lbl:30s} |v|={n:8.3f}{flag}")


if __name__ == "__main__":
    main()
