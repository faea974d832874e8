"""Fused FSCIL fine-tune loop as a single Pallas TPU kernel.

The incremental engine's hot loop (engine/incremental.py, mirroring
reference eval/language_eval.py:242-318) is, after feature caching, a chain
of tiny ops per epoch: two (N,640)x(640,C) matmuls, softmax CE gradients,
three regularizer gradients, and a torch-SGD update — repeated until the
convergence logic stops.  Under XLA's ``lax.while_loop`` each epoch costs a
round trip through HBM for every operand; the total working set, however,
is < 6 MB — it fits in VMEM outright.

This kernel runs the ENTIRE loop on-chip: operands are loaded once, the
``lax.while_loop`` iterates over value-carried (W, momentum) register/VMEM
state, and only the final weights + stats are written back.

Semantics replicated exactly (verified against the XLA path in
tests/test_pallas_finetune.py):
  * CE over support (+ padded replay memory, masked, mean over valid)
  * base-anchor ||W[:60]-W0|| (UN-squared, zero-subgradient at 0)
  * previous-novel anchor ||W[60:60+k]-R|| (UN-squared)
  * subspace pull gamma*||cur @ (I - QQ^T)||^2 with gradient 2*gamma*cur@M
    (M = I - QQ^T, symmetric idempotent), or semantic pull to a constant
    target
  * coupled weight decay -> momentum -> lr update (torch SGD)
  * stable-epoch / target-loss / max-epoch stopping
    (reference eval/language_eval.py:298-318)

Row geometry: class axis padded to a multiple of 128 lanes; support/memory
rows padded to sublane multiples; one-hot targets and the
row-x-active-class masks are built IN-KERNEL from iota + lane-tiled label
vectors (keeps the (N, C) matrices out of both the operand set and the
resident VMEM working set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(cfg):
    (n_sup, memory_on, use_regbase, use_regnovel, pull_mode,
     stable_mode, use_adam, bias_col, c_pad, d, trace_rows) = cfg

    def kernel(f_sup_ref, y_sup_ref, f_mem_ref, y_mem_ref,
               w_ref, mom_ref, nu_ref, w0_ref, reserved_ref,
               pull_op_ref, pull_tgt_ref, scalars_ref,
               w_out_ref, stats_out_ref, trace_out_ref,
               w_s, mom_s, nu_s):
        f_sup = f_sup_ref[:]

        lr = scalars_ref[0, 0]
        wd = scalars_ref[0, 1]
        momentum = scalars_ref[0, 2]
        lmbd_base = scalars_ref[0, 3]
        lmbd_novel = scalars_ref[0, 4]
        gamma = scalars_ref[0, 5]
        eps = scalars_ref[0, 6]
        target_loss = scalars_ref[0, 7]
        min_epochs = scalars_ref[0, 8]
        max_epochs = scalars_ref[0, 9]
        stable_target = scalars_ref[0, 10]
        n_active = scalars_ref[0, 11]
        n_reserved = scalars_ref[0, 12]
        mem_count = scalars_ref[0, 13]
        prev_loss0 = scalars_ref[0, 14]
        stable0 = scalars_ref[0, 15]
        acc1_0 = scalars_ref[0, 18]
        acc5_0 = scalars_ref[0, 19]
        b1 = scalars_ref[0, 20]
        b2 = scalars_ref[0, 21]
        eps_a = scalars_ref[0, 22]

        rows = jax.lax.broadcasted_iota(jnp.int32, (c_pad, d), 0)
        rows_f = rows.astype(jnp.float32)
        # bias-as-feature-column layout: W' = [W | b]; the reg/pull terms
        # need to treat the bias column separately (reference regloss:
        # UN-squared weight norm but SQUARED bias norm,
        # models/resnet_language.py:229-233; the pull never touches bias)
        if bias_col is not None:
            wcols = jax.lax.broadcasted_iota(jnp.int32, (c_pad, d), 1)
            colw = (wcols != bias_col).astype(jnp.float32)
            colb = (wcols == bias_col).astype(jnp.float32)
        base_m = (rows_f < scalars_ref[0, 16]).astype(jnp.float32)   # orig_base
        novel_m = ((rows_f >= scalars_ref[0, 16])
                   & (rows_f < scalars_ref[0, 16] + n_reserved)
                   ).astype(jnp.float32)
        cur_m = ((rows_f >= n_active - scalars_ref[0, 17])          # n_ways
                 & (rows_f < n_active)).astype(jnp.float32)

        # one-hot targets and row-x-active-class masks are rebuilt from
        # iota + the (N,128)-tiled label vectors instead of being passed as
        # (N, C) operands — saves 2*(Ns+Nm)*C words of VMEM and the
        # host-side one-hot construction
        n_sup_rows = f_sup.shape[0]
        n_mem_rows = f_mem_ref.shape[0]

        def targets(y_ref, n_rows, count):
            # Mosaic only accepts integer iota; cast for the f32 compares
            col = jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, c_pad), 1).astype(jnp.float32)
            row = jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, c_pad), 0).astype(jnp.float32)
            rm = ((row < count) & (col < n_active)).astype(jnp.float32)
            y = y_ref[:, 0:1]
            oh = jnp.where((col == y) & (rm > 0), 1.0, 0.0)
            return oh, rm

        def loss_and_grad(w):
            # support CE (targets/masks rebuilt per epoch — cheap VPU iota
            # work that keeps them out of the resident VMEM working set)
            oh_sup, rm_sup = targets(y_sup_ref, n_sup_rows,
                                     jnp.asarray(n_sup, jnp.float32))
            logits = jax.lax.dot_general(
                f_sup, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jnp.where(rm_sup > 0, logits, NEG)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            s = jnp.sum(e, axis=-1, keepdims=True)
            p = e / s
            # loss without materializing logp: each valid row has exactly
            # one target, so sum(oh*logp) = sum(oh*logits) - sum_valid(m +
            # log s) — saves an (N, C) f32 transient in VMEM
            valid_row = jnp.sum(oh_sup, axis=-1, keepdims=True)
            loss = -(jnp.sum(oh_sup * logits)
                     - jnp.sum(valid_row * (m + jnp.log(s)))) * (1.0 / n_sup)
            dlog = (p * rm_sup - oh_sup) * (1.0 / n_sup)
            g = jax.lax.dot_general(
                dlog, f_sup, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            # support top-1/top-5 from THIS epoch's (pre-update) logits —
            # the quantity the reference prints per 10 epochs
            # (eval/language_eval.py:308-315): rank of the true class =
            # number of strictly-greater active-class logits
            logit_y = jnp.sum(oh_sup * logits, axis=-1, keepdims=True)
            # torch.topk breaks exact ties by LOWER index first
            # (ADVICE r2): a tied class with a smaller index outranks the
            # true class
            colf = jax.lax.broadcasted_iota(
                jnp.int32, logits.shape, 1).astype(jnp.float32)
            ysup = y_sup_ref[:, 0:1]
            beats = (logits > logit_y) | ((logits == logit_y)
                                          & (colf < ysup))
            higher = jnp.where(beats & (rm_sup > 0), 1.0, 0.0)
            rank = jnp.sum(higher, axis=-1, keepdims=True)
            validr = jnp.sum(oh_sup, axis=-1, keepdims=True)
            acc1 = jnp.sum(jnp.where(rank < 1, validr, 0.0)) * (100.0 / n_sup)
            acc5 = jnp.sum(jnp.where(rank < 5, validr, 0.0)) * (100.0 / n_sup)

            if memory_on:
                f_mem = f_mem_ref[:]
                oh_mem, rm_mem = targets(y_mem_ref, n_mem_rows, mem_count)
                inv_cnt = 1.0 / jnp.maximum(mem_count, 1.0)
                lg2 = jax.lax.dot_general(
                    f_mem, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                lg2 = jnp.where(rm_mem > 0, lg2, NEG)
                m2 = jnp.max(lg2, axis=-1, keepdims=True)
                e2 = jnp.exp(lg2 - m2)
                s2 = jnp.sum(e2, axis=-1, keepdims=True)
                p2 = e2 / s2
                valid2 = jnp.sum(oh_mem, axis=-1, keepdims=True)
                loss = loss - (jnp.sum(oh_mem * lg2)
                               - jnp.sum(valid2 * (m2 + jnp.log(s2)))
                               ) * inv_cnt
                dlog2 = (p2 * rm_mem - oh_mem) * inv_cnt
                g = g + jax.lax.dot_general(
                    dlog2, f_mem, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            if use_regbase:
                diff = (w - w0_ref[:]) * base_m
                if bias_col is not None:
                    diff_b = diff * colb
                    diff = diff * colw
                sq = jnp.sum(diff * diff)
                norm = jnp.sqrt(jnp.where(sq == 0, 1.0, sq))
                norm = jnp.where(sq == 0, 0.0, norm)
                loss = loss + lmbd_base * norm
                inv = jnp.where(norm == 0, 0.0, 1.0 / jnp.maximum(norm, 1e-30))
                g = g + lmbd_base * diff * inv
                if bias_col is not None:
                    # bias term is SQUARED (resnet_language.py:232)
                    loss = loss + lmbd_base * jnp.sum(diff_b * diff_b)
                    g = g + 2.0 * lmbd_base * diff_b

            if use_regnovel:
                diff = (w - reserved_ref[:]) * novel_m
                sq = jnp.sum(diff * diff)
                norm = jnp.sqrt(jnp.where(sq == 0, 1.0, sq))
                norm = jnp.where(sq == 0, 0.0, norm)
                loss = loss + lmbd_novel * norm
                inv = jnp.where(norm == 0, 0.0, 1.0 / jnp.maximum(norm, 1e-30))
                g = g + lmbd_novel * diff * inv

            if pull_mode == "subspace":
                cur = w * cur_m
                if bias_col is not None:
                    cur = cur * colw      # the pull never touches bias
                v = jnp.dot(cur, pull_op_ref[:],
                            preferred_element_type=jnp.float32)
                loss = loss + gamma * jnp.sum(v * v)
                gp = 2.0 * gamma * v * cur_m
                g = g + (gp * colw if bias_col is not None else gp)
            elif pull_mode == "semantic":
                diff = (w - pull_tgt_ref[:]) * cur_m
                if bias_col is not None:
                    diff = diff * colw
                loss = loss + gamma * jnp.sum(diff * diff)
                g = g + 2.0 * gamma * diff

            return loss, g, acc1, acc5

        def opt_step(w, m, v, p1, p2, g):
            """torch-coupled update: wd into the gradient first, then
            SGD-momentum or Adam with optax's bias correction (the XLA
            path's optax chain; tests pin equality).  ``p1``/``p2`` carry
            b1^t / b2^t via a multiplicative recurrence — Mosaic cannot
            legalize a scalar powf."""
            g = g + wd * w
            if use_adam:
                p1 = p1 * b1
                p2 = p2 * b2
                m = b1 * m + (1.0 - b1) * g
                v = b2 * v + (1.0 - b2) * g * g
                mh = m / (1.0 - p1)
                vh = v / (1.0 - p2)
                w = w - lr * mh / (jnp.sqrt(vh) + eps_a)
            else:
                m = momentum * m + g
                w = w - lr * m
            return w, m, v, p1, p2

        def stop_logic(loss, prev_loss, stable, epoch):
            stop = jnp.asarray(False)
            if stable_mode:
                is_st = jnp.abs(loss - prev_loss) < eps
                stable = jnp.where(is_st, stable + 1.0, 0.0)
                stop = stop | (stable == stable_target)
            stop = stop | (epoch >= max_epochs)
            stop = stop | ((loss <= target_loss) & (epoch >= min_epochs + 1.0))
            return stable, stop

        def cond(carry):
            return ~carry[5]           # stop flag

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        # optimizer state lives in SCRATCH refs, mutated in place — a
        # matrix-valued while_loop carry would double-buffer (Cp, D)
        # tensors in the VMEM stack (measured: the tiered geometry only
        # fits with a scalar-only carry)
        def body(carry):
            p1, p2, prev_loss, stable, epoch, _, _, _ = carry
            epoch = epoch + 1.0
            loss, g, acc1, acc5 = loss_and_grad(w_s[:])
            w, mom, nu, p1, p2 = opt_step(w_s[:], mom_s[:], nu_s[:],
                                          p1, p2, g)
            w_s[:] = w
            mom_s[:] = mom
            if use_adam:
                nu_s[:] = nu
            stable, stop = stop_logic(loss, prev_loss, stable, epoch)
            # per-epoch (loss, acc1, acc5) trace row for observability —
            # read back by the host for the --verbose per-10-epoch prints
            row = jnp.where(lane == 0, loss,
                            jnp.where(lane == 1, acc1,
                                      jnp.where(lane == 2, acc5, 0.0)))
            trace_out_ref[pl.dslice(epoch.astype(jnp.int32), 1), :] = row
            return (p1, p2, loss, stable, epoch, stop, acc1, acc5)

        # epoch 1 already ran outside (train-mode features, one SGD step);
        # ``stable0``/``prev_loss0`` carry its post-update convergence state,
        # so replay its stop decision exactly as the engine would
        stable_init = stable0
        stop_init = jnp.asarray(False)
        if stable_mode:
            stop_init = stop_init | (stable_init == stable_target)
        stop_init = stop_init | (1.0 >= max_epochs)
        stop_init = stop_init | ((prev_loss0 <= target_loss)
                                 & (1.0 >= min_epochs + 1.0))

        trace_out_ref[:] = jnp.zeros((trace_rows, 128), jnp.float32)
        w_s[:] = w_ref[:]
        mom_s[:] = mom_ref[:]
        if use_adam:
            nu_s[:] = nu_ref[:]
        # bias-correction powers after the engine's epoch-1 step: b^1
        carry = (b1, b2, prev_loss0, stable_init,
                 jnp.asarray(1.0), stop_init, acc1_0, acc5_0)
        (p1, p2, loss, stable, epoch, _, acc1,
         acc5) = jax.lax.while_loop(cond, body, carry)

        w_out_ref[:] = w_s[:]
        stats = jnp.where(lane == 0, loss,
                          jnp.where(lane == 1, epoch,
                                    jnp.where(lane == 2, stable,
                                              jnp.where(lane == 3, acc1,
                                                        jnp.where(lane == 4,
                                                                  acc5,
                                                                  0.0)))))
        stats_out_ref[:] = stats

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_sup", "memory_on", "use_regbase", "use_regnovel",
                     "pull_mode", "stable_mode", "use_adam", "bias_col",
                     "orig_base", "n_ways", "trace_rows", "interpret"))
def finetune_loop_pallas(
        f_sup, y_sup, f_mem, y_mem,
        w, mom, nu, w0, reserved, pull_op, pull_tgt, scalars,
        *, n_sup: int, memory_on: bool, use_regbase: bool,
        use_regnovel: bool, pull_mode: str, stable_mode: bool,
        orig_base: int, n_ways: int, trace_rows: int = 8,
        use_adam: bool = False, bias_col: int = None,
        interpret: bool = False):
    """Run the fused loop.  All arrays pre-padded by the caller:
    f_sup (Ns,D); y_sup (Ns,128) f32 labels tiled across lanes;
    f_mem (Nm,D); y_mem (Nm,128); w/mom/w0/reserved/pull_tgt (Cp,D);
    pull_op (D,D); scalars (1,128) f32 laid out as documented in the kernel.
    One-hot targets and row-x-class masks are built in-kernel from iota +
    the label tiles (valid-row/active-class bounds come from n_sup,
    scalars[11] and scalars[13]).
    ``trace_rows`` must exceed ``max_epochs`` (row e of the trace output
    holds epoch e's pre-update (loss, acc1, acc5); rows 0-1 stay zero —
    epoch 1 runs outside the kernel).
    ``mom``/``nu`` carry the optimizer state after the engine's manual
    epoch-1 step: SGD momentum (``nu`` ignored — pass a dummy) or Adam
    first/second moments (``use_adam=True``; scalars 20-22 = b1, b2, eps).
    Bias heads pass ``bias_col`` = the feature index holding the bias
    column of the [W | b] layout (features carry a matching ones column).
    Returns (w_final (Cp,D), stats (1,128), trace (trace_rows,128))."""
    c_pad, d = w.shape
    cfg = (float(n_sup), memory_on, use_regbase, use_regnovel, pull_mode,
           stable_mode, use_adam, bias_col, c_pad, d, trace_rows)
    kernel = _make_kernel(cfg)
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((c_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((trace_rows, 128), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        # w (operand 4) is dead after the initial load and w_out is written
        # once at the end: aliasing lets the compiler reuse the buffer
        input_output_aliases={4: 0},
        scratch_shapes=[
            pltpu.VMEM((c_pad, d), jnp.float32),       # w state
            pltpu.VMEM((c_pad, d), jnp.float32),       # momentum / m1
            pltpu.VMEM((c_pad, d) if use_adam else (8, 128),
                       jnp.float32),                    # adam nu
        ],
        interpret=interpret,
    )(f_sup, y_sup, f_mem, y_mem,
      w, mom, nu, w0, reserved, pull_op, pull_tgt, scalars)
    return out


def label_tile(y, n_rows: int) -> jnp.ndarray:
    """(N,) int labels -> (n_rows, 128) f32 lane-tiled operand."""
    y = jnp.asarray(y, jnp.float32)
    y = jnp.pad(y, (0, n_rows - y.shape[0]))
    return jnp.broadcast_to(y[:, None], (n_rows, 128))


def pack_scalars(lr, wd, momentum, lmbd_base, lmbd_novel, gamma, eps,
                 target_loss, min_epochs, max_epochs, stable_target,
                 n_active, n_reserved, mem_count, prev_loss0, stable0,
                 orig_base, n_ways, acc1_0=0.0, acc5_0=0.0,
                 adam_b1=0.9, adam_b2=0.999,
                 adam_eps=1e-8) -> jnp.ndarray:
    # (1, 128): vmap over seeds batches this operand with a squeezed
    # leading dim, and the TPU lowering then requires the remaining block
    # dims to EQUAL the array's trailing dims — a 2D (1,128) operand
    # satisfies that for both the plain and the vmapped call
    s = jnp.zeros((1, 128), jnp.float32)
    vals = [lr, wd, momentum, lmbd_base, lmbd_novel, gamma, eps,
            target_loss, min_epochs, max_epochs, stable_target,
            n_active, n_reserved, mem_count, prev_loss0, stable0,
            orig_base, n_ways, acc1_0, acc5_0, adam_b1, adam_b2, adam_eps]
    for i, v in enumerate(vals):
        s = s.at[0, i].set(jnp.asarray(v, jnp.float32))
    return s
