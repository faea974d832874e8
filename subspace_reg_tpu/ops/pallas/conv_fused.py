"""Fused conv3x3 + BatchNorm(train) + LeakyReLU Pallas kernels for the
pretraining hot path (reference topology models/resnet_language.py:243-301;
hot loop train_supervised.py:216-244).

Round-2 measured the composed XLA step at 56% of its pure-conv
speed-of-light: BN-train's serial stats->normalize chain and the block-tail
glue (residual add, LeakyReLU, MaxPool) cost conv cycles (BASELINE.md:61-118).
These kernels restructure the stage-1/2 BasicBlocks so that

  * every conv is ONE Pallas matmul in a **paired layout** ``(B, H, W/2, 2C)``
    — two adjacent output pixels share the MXU's 128 output lanes, lifting
    the 64-channel stages off the half-lane floor (75% useful-FLOP density
    vs 50% for a naive Cin=64 im2col),
  * the previous BN's normalize+LeakyReLU is applied in the kernel PROLOGUE
    (a per-channel affine folded into the single padded-patch build), so it
    never costs an HBM pass,
  * per-channel batch-statistic partial sums come out of the matmul
    EPILOGUE while the tile is still in VMEM (the XLA path re-reads the
    925MB stage-1 activation for them),
  * the block tail (bn3 + downsample-bn + residual add + LeakyReLU +
    MaxPool2) is one kernel writing only the pooled output plus a 1-byte
    argmax/sign record per pooled element for the backward pass.

Layout notes.  ``paired(x)[b, h, p, d*C+c] == flat(x)[b, h, 2p+d, c]`` — for
last-dim-major data this is a pure reshape (no data movement), so entering/
leaving the paired world is free.  Inside a kernel the even/odd columns of
the image are the contiguous lane slices ``[:C]``/``[C:2C]``: the 3x3
window's four source columns per output pair become four CONTIGUOUS slab
copies (no stride-2 gathers anywhere).

The packed weight matrix is built once per step in XLA:
``B[(kh*4+cc)*C + ci, d*Cout + co] = W[kh, cc-d, ci, co]`` (zero outside
0<=cc-d<=2) — 75% dense, K = 12*Cin, N = 2*Cout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# weight packing (XLA side, tiny)
# --------------------------------------------------------------------------

def pack_weights_pair(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) HWIO -> (12*Cin, 2*Cout) for the paired-layout matmul.

    Row index = (kh*4 + cc)*Cin + ci where cc in 0..3 addresses the four
    window columns of an output PAIR (orig cols 2p-1, 2p, 2p+1, 2p+2);
    col index = d*Cout + co for output pixel 2p+d.  Entry = W[kh, kw, ci, co]
    with kw = cc - d when 0 <= cc-d <= 2, else zero.
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    out = jnp.zeros((12 * cin, 2 * cout), w.dtype)
    for r in range(3):
        for cc in range(4):
            for d in range(2):
                k = cc - d
                if 0 <= k <= 2:
                    rows = slice((r * 4 + cc) * cin, (r * 4 + cc + 1) * cin)
                    cols = slice(d * cout, (d + 1) * cout)
                    out = out.at[rows, cols].set(w[r, k])
    return out


def pack_weights_1x1_pair(w: jax.Array) -> jax.Array:
    """(1,1,Cin,Cout) -> (2*Cin, 2*Cout) block-diagonal (per-pixel matmul)."""
    cin, cout = w.shape[2], w.shape[3]
    z = jnp.zeros((cin, cout), w.dtype)
    return jnp.block([[w[0, 0], z], [z, w[0, 0]]])


# --------------------------------------------------------------------------
# fused conv kernel
# --------------------------------------------------------------------------

def _conv_pair_kernel(x_ref, wp_ref, aff_ref, y_ref, st_ref,
                      xpad_ref, patch_ref, *, H, P, C2, CO2, relu_in,
                      n_img, dtype):
    """One grid cell: ``n_img`` images.  x (n,H,P,C2) -> y (n,H,P,CO2).

    aff_ref: (2, C2) f32 — rows (scale, shift) of the input affine (the
    PREVIOUS layer's folded BN); identity when the caller passes (1, 0).
    st_ref: (2, CO2) f32 — per-cell partial (sum, sumsq) of the bf16 output.
    """
    C = C2 // 2
    # keep the affine vectors 2D and reshape to the broadcast rank —
    # Mosaic rejects 1D row extractions from the (2, C2) operand
    a = aff_ref[0:1, :].astype(dtype).reshape(1, 1, 1, C2)
    b = aff_ref[1:2, :].astype(dtype).reshape(1, 1, 1, C2)

    # padded + transformed input: xpad[i, 1:H+1, 1:P+1, :] = act(x*a+b)
    xpad_ref[:, :, :, :] = jnp.zeros(xpad_ref.shape, dtype)
    xv = x_ref[:, :, :, :]
    xv = xv * a + b
    if relu_in:
        # lrelu as max(x, 0.1x) — identical for slope<1 (equal at 0, so
        # the >=0 derivative convention is moot here) and avoids a 4D
        # select that Mosaic's remote compiler rejects
        xv = jnp.maximum(xv, xv * jnp.asarray(0.1, dtype))
    xpad_ref[:, 1:H + 1, 1:P + 1, :] = xv

    # patches per kernel row r: A_r[i, h, p, cc*C : +C]
    #   cc=0 -> odd[p-1] = xpad[r+h, p,   C:2C]
    #   cc=1 -> even[p]  = xpad[r+h, p+1, 0:C]
    #   cc=2 -> odd[p]   = xpad[r+h, p+1, C:2C]
    #   cc=3 -> even[p+1]= xpad[r+h, p+2, 0:C]
    # The contraction runs as THREE accumulating K=4C dots (one per kernel
    # row): a single 12C patch buffer read back as a value doubles its
    # stack footprint and overflows the 16MB scoped VMEM at batch scale.
    acc = jnp.zeros((n_img, H, P, CO2), jnp.float32)
    for r in range(3):
        patch_ref[:, :, :, 0 * C:1 * C] = xpad_ref[:, r:r + H, 0:P, C:C2]
        patch_ref[:, :, :, 1 * C:2 * C] = xpad_ref[:, r:r + H, 1:P + 1, 0:C]
        patch_ref[:, :, :, 2 * C:3 * C] = xpad_ref[:, r:r + H, 1:P + 1, C:C2]
        patch_ref[:, :, :, 3 * C:4 * C] = xpad_ref[:, r:r + H, 2:P + 2, 0:C]
        # 4D x 2D contraction over the K lanes: Mosaic lowers this as a
        # matmul without the (n,H,P)->M reshape (P=42 sublanes don't merge
        # cleanly across tile boundaries)
        acc = acc + jax.lax.dot_general(
            patch_ref[:, :, :, :], wp_ref[4 * C * r:4 * C * (r + 1), :],
            (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    yb = acc.astype(dtype)
    y_ref[:, :, :, :] = yb

    # batch-stat partials over the ROUNDED output (matches the XLA path,
    # which computes stats from the stored bf16 activation)
    yf = yb.astype(jnp.float32)
    st_ref[0, 0, :] = jnp.sum(yf, axis=(0, 1, 2))
    st_ref[0, 1, :] = jnp.sum(jnp.square(yf), axis=(0, 1, 2))


def conv3x3_pair(x: jax.Array, wp: jax.Array,
                 affine: Optional[Tuple[jax.Array, jax.Array]] = None,
                 relu_in: bool = False, n_img: int = 1,
                 interpret: bool = False,
                 dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Fused 3x3 conv over paired-layout input.

    x: (B, H, P, 2Cin) bf16;  wp: (12Cin, 2Cout) bf16 (pack_weights_pair).
    affine: optional per-lane (scale, shift), each (2Cin,) f32 — the folded
    BN of the producing layer, applied (with optional LeakyReLU) before the
    conv.  Returns (y (B,H,P,2Cout) bf16, stats (2, 2Cout) f32) where stats
    rows are (sum, sum of squares) of y.
    """
    B, H, P, C2 = x.shape
    K, CO2 = wp.shape
    assert K == 6 * C2, (K, C2)
    assert B % n_img == 0
    G = B // n_img

    if affine is None:
        aff = jnp.stack([jnp.ones((C2,), jnp.float32),
                         jnp.zeros((C2,), jnp.float32)])
    else:
        aff = jnp.stack([affine[0].astype(jnp.float32),
                         affine[1].astype(jnp.float32)])

    kernel = functools.partial(_conv_pair_kernel, H=H, P=P, C2=C2, CO2=CO2,
                               relu_in=relu_in, n_img=n_img, dtype=dtype)
    y, st = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((n_img, H, P, C2), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, CO2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_img, H, P, CO2), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, CO2), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, P, CO2), dtype),
            jax.ShapeDtypeStruct((G, 2, CO2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_img, H + 2, P + 2, C2), dtype),
            pltpu.VMEM((n_img, H, P, 4 * (C2 // 2)), dtype),
        ],
        interpret=interpret,
    )(x.astype(dtype), wp.astype(dtype), aff)
    return y, jnp.sum(st, axis=0)


# --------------------------------------------------------------------------
# block tail: bn3 + ds_bn + residual add + LeakyReLU + MaxPool2
# --------------------------------------------------------------------------

def _tail_kernel(y_ref, r_ref, aff_ref, out_ref, idx_ref, *, H, P, C2,
                 n_img, dtype):
    """o = lrelu((y*a3+b3) + (r*ad+bd)); out = maxpool2(o).

    In the paired layout pooling folds the lane halves (the two pixels of a
    pair are one pooling window's columns) and adjacent H rows:
      pooled[h', p, ci] = max over (row in {2h',2h'+1}, half in {0,1}).
    idx records winner (2 bits: row*2+half) + sign of the winner (bit 2)
    for the backward unpool/lrelu mask.
    """
    C = C2 // 2
    a3 = aff_ref[0:1, :].astype(dtype).reshape(1, 1, 1, C2)
    b3 = aff_ref[1:2, :].astype(dtype).reshape(1, 1, 1, C2)
    ad = aff_ref[2:3, :].astype(dtype).reshape(1, 1, 1, C2)
    bd = aff_ref[3:4, :].astype(dtype).reshape(1, 1, 1, C2)

    o = (y_ref[:, :, :, :] * a3 + b3) + (r_ref[:, :, :, :] * ad + bd)
    o = jnp.maximum(o, o * jnp.asarray(0.1, dtype))

    # four pooling candidates, each (n, H/2, P, C).  Row split via a free
    # leading-dim reshape — a stride-2 H slice lowers to an unsupported
    # gather on Mosaic
    ov = o.reshape(n_img, H // 2, 2, P, C2)
    c0 = ov[:, :, 0, :, 0:C]
    c1 = ov[:, :, 0, :, C:C2]
    c2 = ov[:, :, 1, :, 0:C]
    c3 = ov[:, :, 1, :, C:C2]
    m01 = jnp.maximum(c0, c1)
    m23 = jnp.maximum(c2, c3)
    mx = jnp.maximum(m01, m23)

    # first-max tie-breaking (torch MaxPool2d routes gradient to the first
    # maximal element in window order).  Mosaic's remote compiler rejects
    # >2D selects AND >2D bool casts, so the winner index is pure
    # arithmetic: strict a>b as max(sign(a-b), 0) with the difference
    # taken in f32 (exact for bf16 operands, so ties are exact):
    #   low = (1-tm)*t01 + tm*(2+t23),  idx = low + 4*signbit
    f32 = jnp.float32
    t01 = jnp.maximum(jnp.sign(c1.astype(f32) - c0.astype(f32)), 0.0)
    t23 = jnp.maximum(jnp.sign(c3.astype(f32) - c2.astype(f32)), 0.0)
    tm = jnp.maximum(jnp.sign(m23.astype(f32) - m01.astype(f32)), 0.0)
    # >=0 bit (lrelu'(0)=1): min(sign(mx)+1, 1)
    sgn = jnp.minimum(jnp.sign(mx.astype(f32)) + 1.0, 1.0)
    idx = ((1.0 - tm) * t01 + tm * (2.0 + t23) + 4.0 * sgn)

    out_ref[:, :, :, :] = mx
    idx_ref[:, :, :, :] = idx.astype(jnp.int8)


def block_tail(y3: jax.Array, res: jax.Array,
               aff3: Tuple[jax.Array, jax.Array],
               affd: Tuple[jax.Array, jax.Array],
               n_img: int = 1, paired_out: bool = True,
               interpret: bool = False,
               dtype=jnp.bfloat16) -> Tuple[jax.Array, jax.Array]:
    """Fused BasicBlock tail over paired-layout inputs.

    y3, res: (B, H, P, 2C) (raw conv3 / raw downsample outputs).
    aff3/affd: folded (a, b) per paired lane (2C,) for bn3 / ds_bn.
    The kernel always writes the FLAT pooled map (B, H/2, P, C) plus the
    int8 winner/sign record (bits 0-1: row_parity*2 + col_parity, bit 2:
    sign with lrelu'(0)=1 convention); ``paired_out=True`` re-pairs the
    pooled map with an XLA reshape OUTSIDE the kernel (a lane-count-
    changing reshape inside Mosaic forces an unsupported relayout).
    idx is returned FLAT in both modes (the backward consumes it flat).
    """
    B, H, P, C2 = y3.shape
    assert B % n_img == 0
    G = B // n_img
    aff = jnp.stack([aff3[0], aff3[1], affd[0], affd[1]]).astype(jnp.float32)

    oshape = (B, H // 2, P, C2 // 2)
    oblock = (n_img, H // 2, P, C2 // 2)

    kernel = functools.partial(_tail_kernel, H=H, P=P, C2=C2, n_img=n_img,
                               dtype=dtype)
    out, idx = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((n_img, H, P, C2), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_img, H, P, C2), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, C2), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(oblock, lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(oblock, lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(oshape, dtype),
            jax.ShapeDtypeStruct(oshape, jnp.int8),
        ],
        interpret=interpret,
    )(y3.astype(dtype), res.astype(dtype), aff)
    if paired_out:
        out = paired(out)
    return out, idx


# --------------------------------------------------------------------------
# reference helpers (XLA) for tests and for the stats -> affine fold
# --------------------------------------------------------------------------

def paired(x: jax.Array) -> jax.Array:
    """(B,H,W,C) -> (B,H,W/2,2C); pure reshape for last-dim-major data."""
    B, H, W, C = x.shape
    return x.reshape(B, H, W // 2, 2 * C)


def unpaired(x: jax.Array) -> jax.Array:
    B, H, P, C2 = x.shape
    return x.reshape(B, H, 2 * P, C2 // 2)


def fold_stats(stats: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
    """(2, 2C) paired partials -> per-channel (mean, biased var) over n
    elements per channel (n = B*H*W)."""
    C = stats.shape[1] // 2
    s1 = stats[0, :C] + stats[0, C:]
    s2 = stats[1, :C] + stats[1, C:]
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    return mean, var


def bn_affine(mean: jax.Array, var: jax.Array, scale: jax.Array,
              bias: jax.Array, eps: float = 1e-5
              ) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (a, b) with y_norm = y*a + b; duplicated for the paired
    lane layout."""
    inv = jax.lax.rsqrt(var + eps)
    a = inv * scale
    b = bias - mean * a
    return jnp.concatenate([a, a]), jnp.concatenate([b, b])
