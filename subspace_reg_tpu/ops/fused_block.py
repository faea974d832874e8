"""Fused BasicBlock (stages 1-2 of the RFS ResNet) built on the paired-layout
Pallas kernels — forward fusion of conv+BN(train)+LeakyReLU chains plus the
block tail, with a custom VJP.

Replaces, for the pretraining hot path only, the Flax module composition in
``models/resnet.py::BasicBlock`` (reference models/resnet_language.py:243-301):

    y1=conv1(x); x2=lrelu(bn1(y1)); y2=conv2(x2); x3=lrelu(bn2(y2));
    y3=conv3(x3); r=ds_bn(ds_conv(x)); out=maxpool2(lrelu(bn3(y3)+r))

Semantics preserved exactly (within bf16 rounding): train-mode BN normalizes
with the biased batch variance of the *rounded* bf16 conv output and the
caller updates running stats with the unbiased estimate (models/layers.py
``TorchBatchNorm``); LeakyReLU slope 0.1; MaxPool kernel=stride=2 floor mode
with first-max gradient routing.

The backward is hand-derived (standard train-mode BN backward — the
single-pass E[x^2]-E[x]^2 variance has the same analytic gradient as the
two-pass biased form) and currently runs as XLA ops: the conv dgrad/wgrad
pairs use XLA's own conv emitters via ``jax.vjp`` of a bare conv, so the
backward costs what the unfused path's conv backward costs while the forward
takes the fused kernels.  Stage-entry blocks pass ``need_dx=False`` (the
image is data) which skips conv1/ds dgrad entirely.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .pallas import conv_fused as cf


class BlockStats(NamedTuple):
    """Per-BN (mean, biased var) of this step's batch, for the caller's
    running-stat EMA update (torch momentum-0.1, unbiased update)."""
    bn1: Tuple[jax.Array, jax.Array]
    bn2: Tuple[jax.Array, jax.Array]
    bn3: Tuple[jax.Array, jax.Array]
    ds_bn: Tuple[jax.Array, jax.Array]


def _conv_flat(x, w, dtype=jnp.bfloat16):
    """Bare conv matching the production flax path (nn.Conv with
    dtype=bf16: both operands in compute dtype, f32 MXU accumulation,
    compute-dtype output)."""
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=dn)


def _conv_1x1_flat(x, w11, dtype=jnp.bfloat16):
    """1x1 conv via XLA's conv emitter — an einsum here lowers to a
    skinny-K matmul that measures far slower than the conv path."""
    dn = lax.conv_dimension_numbers(x.shape, w11.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x.astype(dtype), w11.astype(dtype), (1, 1),
        [(0, 0), (0, 0)], dimension_numbers=dn)


def _bn_bwd(g_z, y, mean, var, scale, eps=1e-5):
    """Train-mode BN backward over paired tensors.

    z = a*y + b with a = scale*inv, b = bias - mean*a; mean/var are batch
    statistics OF y (biased var), so gradients flow through them:
      g_y = (a/N) * (N*g_z - sum(g_z) - xhat * sum(g_z*xhat))
      g_scale = sum(g_z * xhat);  g_bias = sum(g_z)
    Reductions fold the two paired lane-halves into per-channel values.
    """
    C2 = g_z.shape[-1]
    C = C2 // 2
    inv = lax.rsqrt(var + eps)                       # (C,)
    inv2 = jnp.concatenate([inv, inv])
    mean2 = jnp.concatenate([mean, mean])
    a2 = jnp.concatenate([scale, scale]) * inv2

    gf = g_z.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xhat = (yf - mean2) * inv2
    axes = tuple(range(g_z.ndim - 1))
    s1 = jnp.sum(gf, axes)                            # (2C,)
    s2 = jnp.sum(gf * xhat, axes)
    s1c = s1[:C] + s1[C:]
    s2c = s2[:C] + s2[C:]
    n = gf.size // C
    g_y = (a2 / n) * (n * gf
                      - jnp.concatenate([s1c, s1c])
                      - xhat * jnp.concatenate([s2c, s2c]))
    return g_y.astype(g_z.dtype), s2c, s1c           # g_scale, g_bias


def _lrelu_bwd(g, act):
    """lrelu'(z) from the ACTIVATION value (act = lrelu(z) preserves sign).
    >=: jax.nn.leaky_relu is where(z >= 0, z, a*z), so the derivative at
    exactly 0 is 1 — bf16 rounding makes exact zeros common enough that a
    strict > here produces visible gradient divergence."""
    one = jnp.asarray(1.0, g.dtype)
    slope = jnp.asarray(0.1, g.dtype)
    return g * jnp.where(act >= 0, one, slope)


def _conv_vjp(x, w, g_y, dtype=jnp.bfloat16):
    """(dgrad, wgrad) of a bare 3x3 conv via XLA's own emitters."""
    _, vjp = jax.vjp(lambda xx, ww: _conv_flat(xx, ww, dtype), x, w)
    gx, gw = vjp(g_y)
    return gx, gw


def _affine_act(y, mean, var, scale, bias, eps=1e-5):
    """x_next = lrelu(bn(y)) in the compute-dtype fast path
    (models/layers.py)."""
    a2, b2 = cf.bn_affine(mean, var, scale, bias, eps)
    z = y * a2.astype(y.dtype) + b2.astype(y.dtype)
    return jnp.where(z >= 0, z, z * jnp.asarray(0.1, y.dtype))


# --------------------------------------------------------------------------
# the block, as a custom-VJP function over a flat param tuple
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_basic_block(x, params, paired_out, need_dx, interpret, dtype,
                      backend="pallas"):
    """Returns (pooled, BlockStats).  The stats output is a buffer (no
    gradient flows back through it — its cotangent is ignored by the VJP,
    matching torch's running-stat semantics).  ``backend``: 'pallas' runs
    the fused Mosaic kernels, 'xla' the identically-structured lax
    program (same idx-record tail, same saved residuals)."""
    if backend == "xla":
        out, stats, _ = _block_fwd_impl_xla(x, params, paired_out, dtype)
    else:
        out, stats, _ = _block_fwd_impl(x, params, paired_out, interpret,
                                        dtype)
    return out, stats


def _block_fwd_impl(x, params, paired_out, interpret, dtype):
    (w1, w2, w3, wd, g1, b1, g2, b2, g3, b3, gd, bd) = params
    B, H, P, C2in = x.shape
    n = B * H * P * 2
    cout = w1.shape[-1]

    # one image per grid cell: n_img=2 overflows VMEM at the wide
    # geometries (patch scratch doubles); per-cell matmul work is ample
    n_img = 1
    wp1 = cf.pack_weights_pair(w1.astype(dtype))
    wp2 = cf.pack_weights_pair(w2.astype(dtype))
    wp3 = cf.pack_weights_pair(w3.astype(dtype))

    y1, st1 = cf.conv3x3_pair(x, wp1, n_img=n_img, interpret=interpret,
                              dtype=dtype)
    m1, v1 = cf.fold_stats(st1, n)
    a1_, b1_ = cf.bn_affine(m1, v1, g1, b1)

    y2, st2 = cf.conv3x3_pair(y1, wp2, affine=(a1_, b1_), relu_in=True,
                              n_img=n_img, interpret=interpret, dtype=dtype)
    m2, v2 = cf.fold_stats(st2, n)
    a2_, b2_ = cf.bn_affine(m2, v2, g2, b2)

    y3, st3 = cf.conv3x3_pair(y2, wp3, affine=(a2_, b2_), relu_in=True,
                              n_img=n_img, interpret=interpret, dtype=dtype)
    m3, v3 = cf.fold_stats(st3, n)
    a3_, b3_ = cf.bn_affine(m3, v3, g3, b3)

    # 1x1 downsample: per-pixel matmul in the paired layout (XLA; the
    # batch-stat reduce fuses into the same pass)
    wdp = cf.pack_weights_1x1_pair(wd.astype(dtype))
    dsr = jnp.einsum("bhpc,cd->bhpd", x.astype(dtype), wdp,
                     preferred_element_type=jnp.float32).astype(dtype)
    dsf = dsr.astype(jnp.float32)
    sd1 = jnp.sum(dsf, (0, 1, 2))
    sd2 = jnp.sum(jnp.square(dsf), (0, 1, 2))
    md, vd = cf.fold_stats(jnp.stack([sd1, sd2]), n)
    ad_, bd_ = cf.bn_affine(md, vd, gd, bd)

    pooled, idx = cf.block_tail(y3, dsr, (a3_, b3_), (ad_, bd_),
                                n_img=n_img, paired_out=paired_out,
                                interpret=interpret, dtype=dtype)

    stats = BlockStats((m1, v1), (m2, v2), (m3, v3), (md, vd))
    resid = (x, y1, y2, y3, dsr, idx, stats, params)
    return pooled, stats, resid


def _block_fwd_impl_xla(x, params, paired_out, dtype):
    """XLA backend: identical computation structure to the Pallas kernels
    (BN affine folds, stats from the rounded conv outputs, one-pass tail
    with the argmax/sign record) expressed as lax ops on the FLAT layout.
    XLA's conv emitter runs these shapes at ~66-91% of peak bf16 (measured
    v5e), so the kernel's job here is the *restructuring*: the tail and
    the backward consume the idx record instead of select-and-scatter,
    and the BN normalize/LeakyReLU chains fuse into conv prologues.
    Residuals are saved in paired shape (a free reshape) so the shared
    backward rule serves both backends."""
    (w1, w2, w3, wd, g1, b1, g2, b2, g3, b3, gd, bd) = params
    xf = cf.unpaired(x)
    B, H, W, _ = xf.shape
    n = B * H * W

    def stats_of(y):
        yf = y.astype(jnp.float32)
        m = jnp.mean(yf, (0, 1, 2))
        v = jnp.maximum(jnp.mean(jnp.square(yf), (0, 1, 2))
                        - jnp.square(m), 0.0)
        return m, v

    def affine_act_flat(y, m, v, sc, bi):
        a2, b2_ = cf.bn_affine(m, v, sc, bi)
        C_ = y.shape[-1]
        z = y * a2[:C_].astype(y.dtype) + b2_[:C_].astype(y.dtype)
        return jnp.where(z >= 0, z, z * jnp.asarray(0.1, y.dtype))

    y1 = _conv_flat(xf, w1, dtype)
    m1, v1 = stats_of(y1)
    x2 = affine_act_flat(y1, m1, v1, g1, b1)
    y2 = _conv_flat(x2, w2, dtype)
    m2, v2 = stats_of(y2)
    x3 = affine_act_flat(y2, m2, v2, g2, b2)
    y3 = _conv_flat(x3, w3, dtype)
    m3, v3 = stats_of(y3)
    dsr = _conv_1x1_flat(xf, wd, dtype)
    md, vd = stats_of(dsr)

    a3_, b3_ = cf.bn_affine(m3, v3, g3, b3)
    ad_, bd_ = cf.bn_affine(md, vd, gd, bd)
    C = y3.shape[-1]
    o = (y3 * a3_[:C].astype(dtype) + b3_[:C].astype(dtype)
         + dsr * ad_[:C].astype(dtype) + bd_[:C].astype(dtype))
    o = jnp.where(o >= 0, o, o * jnp.asarray(0.1, dtype))

    # pooled + first-max idx + sign, matching the Pallas tail encoding:
    # winner = row_parity*2 + col_parity, bit 2 = sign (lrelu'(0)=1)
    c0 = o[:, 0::2, 0::2, :]
    c1 = o[:, 0::2, 1::2, :]
    c2 = o[:, 1::2, 0::2, :]
    c3 = o[:, 1::2, 1::2, :]
    m01 = jnp.maximum(c0, c1)
    m23 = jnp.maximum(c2, c3)
    mx = jnp.maximum(m01, m23)
    idx = jnp.where(c1 > c0, 1, 0).astype(jnp.int32)
    idx = jnp.where(m23 > m01, jnp.where(c3 > c2, 3, 2), idx)
    idx = (idx + jnp.where(mx >= 0, 4, 0)).astype(jnp.int8)

    pooled = cf.paired(mx) if paired_out else mx
    idx_out = idx          # idx stays flat (matches the Pallas tail)

    stats = BlockStats((m1, v1), (m2, v2), (m3, v3), (md, vd))
    resid = (x, cf.paired(y1), cf.paired(y2), cf.paired(y3),
             cf.paired(dsr), idx_out, stats, params)
    return pooled, stats, resid


def _block_fwd_rule(x, params, paired_out, need_dx, interpret, dtype,
                    backend="pallas"):
    if backend == "xla":
        out, stats, resid = _block_fwd_impl_xla(x, params, paired_out,
                                                dtype)
    else:
        out, stats, resid = _block_fwd_impl(x, params, paired_out,
                                            interpret, dtype)
    return (out, stats), resid


def _block_bwd_rule(paired_out, need_dx, interpret, dtype, backend,
                    resid, g):
    g_out, _g_stats = g      # stats are buffers: cotangent ignored
    (x, y1, y2, y3, dsr, idx, stats, params) = resid
    (w1, w2, w3, wd, g1, b1, g2, b2, g3, b3, gd, bd) = params
    B, H, P, C2in = x.shape
    C2 = y1.shape[-1]
    C = C2 // 2

    # ---- tail backward: unpool + lrelu via the idx record ---------------
    # (idx is stored FLAT by both backends)
    g_flat = cf.unpaired(g_out) if paired_out else g_out
    idx_flat = idx
    low = (idx_flat & 3).astype(jnp.int32)
    slope = jnp.where((idx_flat & 4) != 0, jnp.asarray(1.0, dtype),
                      jnp.asarray(0.1, dtype))
    gs = g_flat * slope                    # gradient w.r.t. o_pre at winner
    # place into (B, H, P, 2C): rows 2h'+r, lane half d, winner = r*2+d
    Hh = H // 2
    z = jnp.zeros_like(gs)
    row0 = jnp.concatenate([jnp.where(low == 0, gs, z),
                            jnp.where(low == 1, gs, z)], axis=-1)
    row1 = jnp.concatenate([jnp.where(low == 2, gs, z),
                            jnp.where(low == 3, gs, z)], axis=-1)
    g_opre = jnp.stack([row0, row1], axis=2).reshape(B, H, P, C2)

    # ---- bn3 / ds_bn backward -------------------------------------------
    m3, v3 = stats.bn3
    g_y3, gg3, gb3 = _bn_bwd(g_opre, y3, m3, v3, g3)
    md, vd = stats.ds_bn
    g_dsr, ggd, gbd = _bn_bwd(g_opre, dsr, md, vd, gd)

    # ---- conv3 -----------------------------------------------------------
    m2, v2 = stats.bn2
    x3 = _affine_act(y2, m2, v2, g2, b2)
    g_x3, gW3 = _conv_vjp(cf.unpaired(x3), w3.astype(dtype),
                          cf.unpaired(g_y3), dtype)
    g_x3 = cf.paired(g_x3)

    # ---- bn2 + conv2 -----------------------------------------------------
    g_z2 = _lrelu_bwd(g_x3, x3)
    g_y2, gg2, gb2 = _bn_bwd(g_z2, y2, m2, v2, g2)
    m1, v1 = stats.bn1
    x2 = _affine_act(y1, m1, v1, g1, b1)
    g_x2, gW2 = _conv_vjp(cf.unpaired(x2), w2.astype(dtype),
                          cf.unpaired(g_y2), dtype)
    g_x2 = cf.paired(g_x2)

    # ---- bn1 + conv1 / ds ------------------------------------------------
    g_z1 = _lrelu_bwd(g_x2, x2)
    g_y1, gg1, gb1 = _bn_bwd(g_z1, y1, m1, v1, g1)

    xf = cf.unpaired(x)

    def _ds_vjp(xx, ww, gg):
        _, vjp = jax.vjp(lambda a, b: _conv_1x1_flat(a, b, dtype), xx, ww)
        return vjp(gg)

    if need_dx:
        g_x_c, gW1 = _conv_vjp(xf, w1.astype(dtype),
                               cf.unpaired(g_y1), dtype)
        g_x_d, gWd = _ds_vjp(xf, wd.astype(dtype), cf.unpaired(g_dsr))
        g_x = cf.paired(g_x_c + g_x_d)
    else:
        _, gW1 = _conv_vjp(xf, w1.astype(dtype), cf.unpaired(g_y1), dtype)
        _, gWd = _ds_vjp(xf, wd.astype(dtype), cf.unpaired(g_dsr))
        g_x = jnp.zeros_like(x)

    g_params = (gW1.astype(w1.dtype), gW2.astype(w2.dtype),
                gW3.astype(w3.dtype), gWd.astype(wd.dtype),
                gg1.astype(g1.dtype), gb1.astype(b1.dtype),
                gg2.astype(g2.dtype), gb2.astype(b2.dtype),
                gg3.astype(g3.dtype), gb3.astype(b3.dtype),
                ggd.astype(gd.dtype), gbd.astype(bd.dtype))
    return g_x, g_params


fused_basic_block.defvjp(_block_fwd_rule, _block_bwd_rule)


# --------------------------------------------------------------------------
# module-facing wrapper
# --------------------------------------------------------------------------

def params_tuple_from_flax(p: Dict[str, Any]) -> Tuple[jax.Array, ...]:
    """Extract the flat param tuple from a Flax BasicBlock param subtree
    (models/resnet.py naming: conv1..3, ds_conv, bn1..3, ds_bn)."""
    return (p["conv1"]["kernel"], p["conv2"]["kernel"], p["conv3"]["kernel"],
            p["ds_conv"]["kernel"],
            p["bn1"]["scale"], p["bn1"]["bias"],
            p["bn2"]["scale"], p["bn2"]["bias"],
            p["bn3"]["scale"], p["bn3"]["bias"],
            p["ds_bn"]["scale"], p["ds_bn"]["bias"])


def fused_block_apply(x_flat: jax.Array, p: Dict[str, Any],
                      paired_in: bool = False, paired_out: bool = True,
                      need_dx: bool = True, interpret: bool = False,
                      dtype=jnp.bfloat16, backend: str = "pallas"):
    """Apply the fused block to a FLAT (B,H,W,C) input (or paired when
    ``paired_in``).  Returns (out, BlockStats).  ``out`` is paired unless
    ``paired_out=False`` (stage exit -> flat for the XLA stages).

    The stats come from a stop-gradient re-fold of the forward partials —
    they are computed inside the VJP forward; to expose them without a
    second kernel run the function re-derives them from a cheap XLA replay
    of the stat math on the saved activations is NOT done; instead we run
    the impl directly when no gradient is requested.
    """
    params = params_tuple_from_flax(p)
    x = x_flat if paired_in else cf.paired(x_flat)
    if x.shape[-1] == 6:       # stage-entry 3-channel image: pad to 4
        B, H, P, _ = x.shape
        xf = x.reshape(B, H, 2 * P, 3)
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, 0), (0, 1)))
        x = xf.reshape(B, H, P, 8)
        w1, w2, w3, wd = params[0], params[1], params[2], params[3]
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, 1), (0, 0)))
        wd = jnp.pad(wd, ((0, 0), (0, 0), (0, 1), (0, 0)))
        params = (w1, w2, w3, wd) + params[4:]
    return fused_basic_block(x, params, paired_out, need_dx, interpret,
                             dtype, backend)
