#!/usr/bin/env python
"""Offline label->image linear-mapping trainer (reference learn_mapping.py:41-76).

Regresses label embeddings (GloVe = first 300 dims of the 500-d Vico
pickle) onto the pretrained classifier rows with full-batch MSE/SGD
(lr=1.0, wd=5e-4, 1000 epochs), then stores the result into the checkpoint
under ``mapping_linear_label2image``.

TPU-native: the whole 1000-epoch optimization is ONE lax.fori_loop inside a
single jit — it runs in milliseconds.

Usage:
  python tools/learn_mapping.py --model_path ckpt.pth --save_path out.pth \
      --word_embed_path word_embeds --dataset miniImageNet [--no-glove]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LR = 1.0
WD = 5e-4
EPOCHS = 1000


def train_linear_map(label_embeds: np.ndarray, base_weight: np.ndarray,
                     lr: float = LR, wd: float = WD, epochs: int = EPOCHS,
                     seed: int = 0):
    """Returns (weight (out,in) torch-Linear layout, bias (out,))."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(label_embeds, jnp.float32)           # (n, in)
    t = jnp.asarray(base_weight, jnp.float32)            # (n, out)
    in_dim, out_dim = x.shape[1], t.shape[1]
    k = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    kw, kb = jax.random.split(jax.random.PRNGKey(seed))
    w = jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -k, k)
    b = jax.random.uniform(kb, (out_dim,), jnp.float32, -k, k)

    @jax.jit
    def run(w, b):
        def step(_, wb):
            w, b = wb
            def loss_fn(w, b):
                pred = x @ w.T + b
                return jnp.mean(jnp.square(pred - t))     # nn.MSELoss
            gw, gb = jax.grad(loss_fn, argnums=(0, 1))(w, b)
            # torch SGD with coupled weight decay, no momentum
            w = w - lr * (gw + wd * w)
            b = b - lr * (gb + wd * b)
            return (w, b)
        return jax.lax.fori_loop(0, epochs, step, (w, b))

    w, b = run(w, b)
    return np.asarray(w), np.asarray(b)


def main(argv=None):
    from subspace_reg_tpu.utils.jax_setup import configure as _jc
    _jc()
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--word_embed_path", default="word_embeds")
    p.add_argument("--dataset", default="miniImageNet")
    p.add_argument("--word_embed_size", type=int, default=500)
    p.add_argument("--no-glove", dest="glove", action="store_false")
    args = p.parse_args(argv)

    from subspace_reg_tpu.models.embeds import get_embeds
    from subspace_reg_tpu.utils.checkpoint import load_any, save_checkpoint

    variables, head, meta = load_any(args.model_path)
    base_labels = [n for n in meta["label2human"] if n != ""]
    pth = os.path.join(args.word_embed_path,
                       f"{args.dataset}_dim{args.word_embed_size}.pickle")
    embeds = np.asarray(get_embeds(pth, base_labels, args.word_embed_size),
                        np.float32)
    dim = 300 if args.glove else args.word_embed_size
    embeds = embeds[:, :dim]
    n = int(head.n_active)
    base_w = np.asarray(head.weight)[:n]

    w, b = train_linear_map(embeds, base_w)
    final = float(np.mean((embeds @ w.T + b - base_w) ** 2))
    print(f"final MSE: {final:.6f}")

    meta = dict(meta)
    meta["mapping_linear_label2image"] = {"weight": w, "bias": b}
    if args.save_path.endswith(".pth"):
        # reference interchange format (learn_mapping.py:37-39 appends the
        # LinearMap state_dict to the torch ckpt); load_any dispatches .pth
        # to the torch reader, so the bytes must actually BE torch format
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from export_pth import write_pth
        write_pth(variables, head, meta, args.save_path)
    else:
        save_checkpoint(args.save_path, variables, head, meta)
    print("saved", args.save_path)


if __name__ == "__main__":
    main()
