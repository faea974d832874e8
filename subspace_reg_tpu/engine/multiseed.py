"""Vmapped multi-seed FSCIL evaluation — one chip replaces the reference's
Slurm seed array (scripts/continual/slurm_*.sh:8,19-27: 10 single-GPU jobs).

The compiled session program (engine/incremental.py) is already shape-static
across seeds, so a ``jax.vmap`` over the seed axis batches the ENTIRE
incremental phase: per-seed backbones (different pretrained weights), padded
heads, query/memory buffers, base batches and attractors all gain a leading
seed dimension; the fine-tune while_loop freezes lanes that converge early
(stop-masked updates).  Host-side episode composition runs per seed with
the reference's exact per-process np.random stream semantics (each seed's
episode draw is immediately followed by its replay-memory index draw,
mirroring the stand-alone engine's stream pairing).

The fused Pallas loop vmaps over seeds (a leading grid dimension; same
per-lane VMEM working set), so ``pallas_mode='auto'`` serves the fan-out
with the same kernel as the stand-alone engine; bias heads are supported
(bias+novel-anchor is refused exactly as the stand-alone engine refuses it).
Prediction dumps (``save_preds_0``) write the reference-named per-seed
CSVs, byte-identical to stand-alone runs; the per-epoch weight-tracking
CSVs remain a stand-alone-engine feature (they require per-epoch host
access, which would serialize the vmapped lanes).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .incremental import session_count
from ..data.episodes import EpisodeSampler, get_vocabs
from ..data.mini_imagenet import LazyRows
from ..data.transforms import transforms_test_options
from ..models import head as head_lib
from ..models import lang_puller as lp
from ..ops import augment as aug_ops
from .incremental import (IncrementalResult, _Meter, build_geometry,
                          eval_base_fn, make_session_fn)


# one-slot cache of the HBM-staged novel split: (host ndarray ref, device
# array).  Seed groups in one fan-out all read the same pickle-cached host
# array, so the upload happens once per process, not once per group.
_novel_stage_cache: Dict[int, Any] = {}


@dataclass
class MultiSeedResult:
    per_seed: List[IncrementalResult]
    seeds: List[int]

    @property
    def novel_mean(self):
        return float(np.mean([r.acc_novel_avg for r in self.per_seed]))

    @property
    def base_mean(self):
        return float(np.mean([r.acc_base_avg for r in self.per_seed]))


def few_shot_finetune_multiseed(
        backbone, per_seed_variables: Sequence[Dict[str, Any]],
        per_seed_heads, per_seed_meta: Sequence[Dict[str, Any]],
        opts: Sequence, per_seed_samplers: Sequence[EpisodeSampler],
        per_seed_base_test, per_seed_base_support=None,
        verbose: bool = False, shard_over_devices: bool = False,
        pallas_mode: str = "auto") -> MultiSeedResult:
    """Run the multi-session protocol for S seeds simultaneously.

    ``opts`` differ only in ``set_seed``; all static hyperparameters must
    match (one compiled program).  Each list argument has length S.

    ``shard_over_devices=True`` lays the seed axis out over a 1-D device
    mesh — on a pod each chip runs its share of the seed batch, the full
    pod-level counterpart of the reference's Slurm array (XLA partitions
    the vmapped program; no code change per scale).
    """
    S = len(opts)
    opt0 = opts[0]
    prt = print if verbose else (lambda *a, **k: None)

    seed_sharding = None
    if shard_over_devices:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        n_dev = max(d for d in range(1, jax.device_count() + 1)
                    if S % d == 0)
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("seed",))
        seed_sharding = NamedSharding(mesh, P("seed"))
        prt(f"sharding {S} seeds over {n_dev} devices")

    def maybe_shard(x):
        if seed_sharding is None:
            return x
        return jax.device_put(x, seed_sharding)

    train_spec, test_spec = transforms_test_options[opt0.transform]
    img_size = per_seed_base_test[0].imgs.shape[1]
    base_eval_n = opt0.test_base_batch_size // 2
    head0 = per_seed_heads[0]
    geo = build_geometry(opt0, n_base=int(head0.n_active),
                         img_size=img_size, base_eval_n=base_eval_n,
                         feat_dim=int(head0.in_dim),
                         has_base_support=per_seed_base_support is not None)
    with_bias = head0.bias is not None
    if with_bias and opt0.lmbd_reg_novel is not None:
        # same refusal as the stand-alone engine: the reference
        # reglossnovel bias branch crashes (models/resnet_language.py:239)
        raise NotImplementedError(
            "reglossnovel with a bias head reproduces a reference crash "
            "(models/resnet_language.py:239); drop --lmbd_reg_novel or "
            "use --no_linear_bias")

    # chunked eval forwards: without them, vmapping S seeds over the
    # 1000-row query/base eval batches materializes an (S*1000, 84, 84, 64)
    # stage-1 activation that exceeds single-chip HBM for S >= ~5.
    # ``pallas_mode='auto'`` routes each vmapped lane through the fused
    # fine-tune kernel (vmap adds a leading seed grid dimension; the
    # per-lane VMEM working set is unchanged).
    fns = make_session_fn(backbone, opt0, geo, with_bias,
                          pallas_mode=pallas_mode,
                          eval_chunk=geo.n_query_per_session)
    # the vmapped wrappers are cached alongside fns: make_session_fn memoizes
    # across invocations, so re-wrapping here would discard that and retrace
    # the whole vmapped program per seed group (tens of seconds each)
    vsession = fns.get("_vsession")
    if vsession is None:
        vsession = jax.jit(jax.vmap(
            fns["session"],
            in_axes=(0, 0, 0, None, 0, 0, 0, None, 0, 0, 0, 0, None,
                     0, 0, None, 0, 0, 0, None, 0)))
        fns["_vsession"] = vsession
    vaugment = fns.get("_vaugment")
    if vaugment is None:
        vaugment = jax.jit(jax.vmap(
            lambda h, k: head_lib.augment(h, k, geo.n_ways)))
        fns["_vaugment"] = vaugment

    # per-seed RNG streams mirror the reference's per-process global stream
    streams = []
    for opt in opts:
        np.random.seed(opt.set_seed)
        streams.append(np.random.get_state())

    # stacked state.  Host (numpy) per-seed trees — the run_seeds path —
    # are stacked on host and uploaded in ONE packed transfer
    # (checkpoint.device_put_packed); device trees stack on device.
    def stack_vars(vs):
        leaves = jax.tree_util.tree_leaves(vs[0])
        if leaves and all(isinstance(x, np.ndarray)
                          for x in jax.tree_util.tree_leaves(vs)):
            from ..utils.checkpoint import device_put_packed
            # seeds loaded from the SAME checkpoint share leaf objects
            # (run_seeds caches load_any by path): upload one copy and
            # broadcast on device instead of shipping S identical ~50MB
            # backbones through the ~19MB/s relay tunnel
            if len(vs) > 1 and all(
                    all(a is b for a, b in zip(
                        leaves, jax.tree_util.tree_leaves(v)))
                    for v in vs[1:]):
                return device_put_packed(vs[0], lanes=len(vs))
            stacked = jax.tree_util.tree_map(
                lambda *xs: np.stack(xs), *vs)
            return device_put_packed(stacked)
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vs)

    t_eng = time.time()
    variables = jax.tree_util.tree_map(
        maybe_shard, stack_vars(list(per_seed_variables)))
    prt(f"[stack_vars {time.time() - t_eng:.1f}s]", flush=True)
    # head/anchor/reserved state lives on device for the whole run: the
    # per-session host round-trips (pull grown weights, re-upload w0/b0/
    # reserved every session) each cost a relay RTT and re-send ~MBs
    # through the host<->chip tunnel
    head_w = jnp.asarray(np.stack([np.asarray(h.weight, np.float32)
                                   for h in per_seed_heads]))
    n_active = int(head0.n_active)
    w0 = head_w
    if with_bias:
        head_b = jnp.asarray(np.stack([np.asarray(h.bias, np.float32)
                                       for h in per_seed_heads]))
    else:
        head_b = jnp.zeros((S, geo.max_classes), jnp.float32)
    b0 = head_b

    # base eval/support staging stays on device end-to-end: upload the
    # stacked uint8 once (4x smaller than f32 through the relay tunnel),
    # normalize/augment on device, never pull pixels back to host
    base_u8, base_y, base_sup_u8, base_sup_y, base_sup_keys = \
        [], [], [], [], []
    for s_i, (opt, bt) in enumerate(zip(opts, per_seed_base_test)):
        min_lbl = min(bt.labels)
        base_u8.append(bt.imgs[:base_eval_n])
        base_y.append(np.asarray(
            [l - min_lbl for l in bt.labels[:base_eval_n]], np.int32))
        if per_seed_base_support is not None:
            ep = per_seed_base_support[s_i].get(0)
            base_sup_keys.append(jax.random.PRNGKey(opt.set_seed * 7919 + 17))
            base_sup_u8.append(ep.support_x)
            base_sup_y.append(ep.support_y.astype(np.int32))
    base_x = aug_ops.normalize_batch(
        jnp.asarray(np.stack(base_u8)), test_spec)
    base_y_host = np.stack(base_y)
    base_y = jnp.asarray(base_y_host)
    base_sup_x = None
    if base_sup_u8:
        base_sup_x = jax.vmap(
            lambda k, x: aug_ops.augment_batch(k, x, train_spec))(
                jnp.stack(base_sup_keys),
                jnp.asarray(np.stack(base_sup_u8)))

    # stage uint8 images in HBM once (the standalone engine's design):
    # episodes become device-side gathers from host-sent index vectors.
    #
    # Lazy splits (run_seeds passes lazy=True): every seed's novel split
    # is a LazyRows view over the SAME pickle-cached full array, even
    # though the per-seed class shuffles select different rows.  Stage the
    # FULL array once — it serves every seed in every group — and compose
    # episode indices through each seed's ``sel`` on host (index
    # arithmetic, no pixels).  Eager splits keep the content-equality
    # path (one copy serves all only when seeds coincide; distinct
    # content falls back to per-episode pixel uploads).
    # The staged copy is cached across seed GROUPS (keyed by host-array
    # identity, holding the host ref).
    novel_imgs_dev = None
    novel_sel = None
    _imgs0 = per_seed_samplers[0].base.imgs
    if isinstance(_imgs0, LazyRows):
        full0 = _imgs0.full
        if all(isinstance(s.base.imgs, LazyRows)
               and s.base.imgs.full is full0
               for s in per_seed_samplers[1:]):
            cached = _novel_stage_cache.get(id(full0))
            if cached is not None and cached[0] is full0:
                novel_imgs_dev = cached[1]
            else:
                novel_imgs_dev = jnp.asarray(full0)
                _novel_stage_cache.clear()
                _novel_stage_cache[id(full0)] = (full0, novel_imgs_dev)
            novel_sel = [np.asarray(s.base.imgs.sel)
                         for s in per_seed_samplers]
    elif all(s.base.imgs is _imgs0 or np.array_equal(s.base.imgs, _imgs0)
             for s in per_seed_samplers[1:]):
        cached = _novel_stage_cache.get(id(_imgs0))
        if cached is not None and cached[0] is _imgs0:
            novel_imgs_dev = cached[1]
        else:
            novel_imgs_dev = jnp.asarray(_imgs0)
            _novel_stage_cache.clear()
            _novel_stage_cache[id(_imgs0)] = (_imgs0, novel_imgs_dev)

    reserved = jnp.zeros((S, geo.max_novel, geo.feat_dim), jnp.float32)
    n_reserved = 0
    memory_data = jnp.zeros((S, geo.max_memory, img_size, img_size, 3),
                            jnp.float32)
    memory_labels = np.zeros((S, geo.max_memory), np.int32)
    memory_count = 0
    query_buf = jnp.zeros((S, geo.max_queries, img_size, img_size, 3),
                          jnp.float32)
    query_y_buf = np.zeros((S, geo.max_queries), np.int32)

    # prediction dumps (reference language_eval.py:407-438), per seed
    save_preds = bool(getattr(opt0, "save_preds_0", False))
    if save_preds:
        from ..utils.artifacts import new_prediction_rows
        preds_rows = [new_prediction_rows() for _ in range(S)]
        id2orig: List[Dict] = [dict() for _ in range(S)]
        basec_map_rev: List[Dict] = []
        for meta, opt in zip(per_seed_meta, opts):
            m = {}
            if opt.continual and meta.get("training_classes"):
                m = {v: k for k, v in meta["training_classes"].items()}
            basec_map_rev.append(m)

    meters = [( _Meter(), _Meter()) for _ in range(S)]
    weighted = [[] for _ in range(S)]
    novel_l = [[] for _ in range(S)]
    base_l = [[] for _ in range(S)]
    traces = [[] for _ in range(S)]
    epochs_l = [[] for _ in range(S)]
    secs = [[] for _ in range(S)]
    vocab_base = [None] * S
    vocab_novel = [None] * S
    lang_state = [None] * S

    # initial base accuracy per seed (language_eval.py:128-129)
    bev = fns.get("_vbase_eval")
    if bev is None:
        bev = jax.vmap(eval_base_fn(backbone,
                                    eval_chunk=geo.n_query_per_session),
                       in_axes=(0, 0, None, None, 0, 0))
        fns["_vbase_eval"] = bev
    t_ib = time.time()
    init_base = np.asarray(bev(variables, jnp.asarray(head_w), None,
                               n_active, base_x, base_y))
    prt(f"[init_base {time.time() - t_ib:.1f}s; setup total "
        f"{time.time() - t_eng:.1f}s]", flush=True)
    for s_i in range(S):
        weighted[s_i].append(float(init_base[s_i]))

    iter_num = session_count(opt0)
    nq = geo.n_query_per_session

    for idx in range(iter_num):
        t0 = time.time()
        sup_stack, qry_stack, supy_stack, sem_stack = [], [], [], []
        mem_inds = []
        # reserve previous session's novel rows — vectorized over seeds,
        # straight from the device-resident head (language_eval.py:169-186)
        if idx >= 1:
            lo = geo.orig_base + geo.n_ways * (idx - 1)
            reserved = reserved.at[
                :, geo.n_ways * (idx - 1): geo.n_ways * idx].set(
                    head_w[:, lo: lo + geo.n_ways])
        for s_i, opt in enumerate(opts):
            np.random.set_state(streams[s_i])
            sampler = per_seed_samplers[s_i]
            ep = sampler.get(idx)

            if idx > 0:
                pvb, pvn = vocab_base[s_i], vocab_novel[s_i]
            vb, _, vn, orig2id = get_vocabs(
                per_seed_base_test[s_i], sampler.base, ep.query_y)
            vocab_base[s_i] = (pvb + pvn) if idx > 0 else vb
            vocab_novel[s_i] = vn

            for k in list(orig2id.keys()):
                orig2id[k] = orig2id[k] + idx * opt.n_ways
            if save_preds:
                for k, v in orig2id.items():
                    id2orig[s_i][v] = k
            q_ids = np.asarray([orig2id[int(y)] for y in ep.query_y],
                               np.int32)
            s_ids = np.asarray([orig2id[int(y)] for y in ep.support_y],
                               np.int32)

            # device-side episode realization (same design as the
            # stand-alone engine): gather uint8 rows from the staged split,
            # augment on device, never pull pixels back to host
            k_aug = jax.random.PRNGKey(opt.set_seed * 100003 + idx)
            if novel_imgs_dev is not None and ep.support_idx is not None:
                sidx = np.asarray(ep.support_idx)
                qidx = np.asarray(ep.query_idx)
                if novel_sel is not None:
                    # lazy split: episode indices are split-local; map
                    # them into the staged FULL array through this
                    # seed's selection vector (host index arithmetic)
                    sidx = novel_sel[s_i][sidx]
                    qidx = novel_sel[s_i][qidx]
                sup_u8 = jnp.take(novel_imgs_dev,
                                  jnp.asarray(sidx, jnp.int32),
                                  axis=0)
                qry_u8 = jnp.take(novel_imgs_dev,
                                  jnp.asarray(qidx, jnp.int32),
                                  axis=0)
            else:
                sup_u8 = jnp.asarray(ep.support_x)
                qry_u8 = jnp.asarray(ep.query_x)
            sx = aug_ops.augment_batch(k_aug, sup_u8, train_spec)
            qry_stack.append(aug_ops.normalize_batch(qry_u8, test_spec))
            query_y_buf[s_i, idx * nq:(idx + 1) * nq] = q_ids
            if per_seed_base_support is not None:
                sx = jnp.concatenate([sx, base_sup_x[s_i]], 0)
                s_ids = np.concatenate([s_ids, base_sup_y[s_i]])
            sup_stack.append(sx)
            supy_stack.append(s_ids)

            # the replay-index draw continues this seed's stream
            # (language_eval.py:352-359)
            if opt.memory_replay:
                inds = np.random.choice(opt.n_shots, opt.memory_replay)
                margin = 5 * np.arange(5)
                offset = np.arange(0, 125, 25)
                inds = (np.tile(margin + inds, (5, 1))
                        + (np.tile(offset, (5, 1))).T).flatten()
                mem_inds.append(inds)
            streams[s_i] = np.random.get_state()

            # semantic attractors per seed
            sem = np.zeros((geo.n_ways, geo.feat_dim), np.float32)
            if (opt.label_pull is not None
                    and getattr(opt, "pulling", "regularize") == "regularize"
                    and opt.attraction_override != "distance2subspace"):
                if idx == 0:
                    lang_state[s_i] = lp.create_lang_puller(
                        opt, vocab_base[s_i], vn)
                else:
                    lang_state[s_i] = lp.update_novel_embeds(
                        lang_state[s_i], opt, vn)
                if opt.attraction_override == "mapping_linear_label2image":
                    m = per_seed_meta[s_i]["mapping_linear_label2image"]
                    lang_state[s_i] = lp.with_mapping(
                        lang_state[s_i], m["weight"], m["bias"])
                # f64 host computation, rounded once to f32 — the same
                # library-independent value the single-seed engine uses
                # (see lp.pullers_host_f64)
                sem = lp.pullers_host_f64(
                    lang_state[s_i], np.asarray(w0[s_i, : geo.orig_base]))
            sem_stack.append(sem)

        if idx >= 1:
            n_reserved = geo.n_ways * idx

        # one (S, nq, H, W, 3) slice write grows every seed's query
        # collection together (language_eval.py:198-204)
        query_buf = jax.lax.dynamic_update_slice(
            query_buf, jnp.stack(qry_stack), (0, idx * nq, 0, 0, 0))

        # grow heads (vmapped augment)
        grow_keys = jnp.stack([jax.random.PRNGKey(o.set_seed * 61 + 1000 + idx)
                               for o in opts])
        heads = head_lib.Head(
            weight=head_w, bias=head_b if with_bias else None,
            n_active=jnp.full((S,), n_active, jnp.int32))
        grown = vaugment(heads, grow_keys)
        head_w = grown.weight
        if with_bias:
            head_b = grown.bias
        n_active += geo.n_ways

        sup_x_dev = jnp.stack(sup_stack)
        out = vsession(
            variables, maybe_shard(head_w),
            head_b, jnp.asarray(n_active, jnp.int32),
            w0, b0, reserved, jnp.asarray(n_reserved, jnp.int32),
            sup_x_dev, jnp.asarray(np.stack(supy_stack)),
            memory_data, jnp.asarray(memory_labels),
            jnp.asarray(memory_count, jnp.int32),
            query_buf, jnp.asarray(query_y_buf),
            jnp.asarray(idx + 1, jnp.int32),
            base_x, base_y,
            jnp.asarray(np.stack(sem_stack)),
            jnp.asarray(idx, jnp.int32),
            jnp.stack([jax.random.PRNGKey(o.set_seed * 31 + idx)
                       for o in opts]))
        new_w, new_b, new_stats, new_counters, metrics = out
        head_w = new_w
        if with_bias:
            head_b = new_b
        variables = {"params": variables["params"],
                     "batch_stats": new_stats, "counters": new_counters}

        if opt0.memory_replay:
            # one vmapped gather + slice write stores every seed's replay
            # rows without pulling pixels to host (language_eval.py:352-359)
            rows = jax.vmap(lambda s, i: s[i])(
                sup_x_dev, jnp.asarray(np.stack(mem_inds)))
            memory_data = jax.lax.dynamic_update_slice(
                memory_data, rows, (0, memory_count, 0, 0, 0))
            for s_i, inds in enumerate(mem_inds):
                memory_labels[s_i, memory_count:memory_count + len(inds)] = \
                    supy_stack[s_i][inds]
            memory_count += len(mem_inds[0])

        # one packed device->host pull for everything the bookkeeping needs
        pull = {k: metrics[k]
                for k in ("chunk_accs", "chunk_valid", "base_acc", "epochs")}
        if save_preds:
            pull["query_preds"] = metrics["query_preds"]
            pull["base_preds"] = metrics["base_preds"]
        pulled = jax.device_get(pull)
        chunk_accs = pulled["chunk_accs"]
        chunk_valid = pulled["chunk_valid"]
        base_accs = pulled["base_acc"]
        epochs_run = pulled["epochs"]
        dt = time.time() - t0
        for s_i, opt in enumerate(opts):
            trace = [round(float(a), 2)
                     for a in chunk_accs[s_i][chunk_valid[s_i]]]
            test_acc = float(np.array(trace).mean())
            acc_b = float(base_accs[s_i])
            meters[s_i][1].update(test_acc)
            meters[s_i][0].update(acc_b)
            w1 = 200 if opt.dataset == "tieredImageNet" else 60
            w2 = geo.n_ways * (idx + 1)
            weighted[s_i].append(
                round((w1 * acc_b + w2 * test_acc) / (w1 + w2), 2))
            novel_l[s_i].append(round(test_acc, 2))
            base_l[s_i].append(round(acc_b, 2))
            traces[s_i].append(trace)
            epochs_l[s_i].append(int(epochs_run[s_i]))
            secs[s_i].append(dt / S)
            if save_preds:
                from ..utils.artifacts import (accumulate_prediction_rows,
                                               predictions_csv_name,
                                               save_predictions_csv)
                nq0 = geo.n_query_per_session
                accumulate_prediction_rows(
                    preds_rows[s_i], idx,
                    pulled["query_preds"][s_i][:nq0],
                    query_y_buf[s_i][:nq0],
                    pulled["base_preds"][s_i],
                    base_y_host[s_i],
                    id2orig[s_i], basec_map_rev[s_i])
                if idx == iter_num - 1:
                    import os
                    os.makedirs("csv_files_mem", exist_ok=True)
                    fname = predictions_csv_name(opt)
                    save_predictions_csv(
                        fname, {k: np.asarray(v)
                                for k, v in preds_rows[s_i].items()})
                    prt("saved", fname)
        prt(f"session {idx}: novel {[n[-1] for n in novel_l]} "
            f"base {[b[-1] for b in base_l]} [{dt:.1f}s]", flush=True)

    results = [
        IncrementalResult(
            acc_novel_avg=meters[s_i][1].avg, acc_base_avg=meters[s_i][0].avg,
            weighted_avg_l=weighted[s_i], acc_novel_list=novel_l[s_i],
            acc_base_list=base_l[s_i], novel_session_traces=traces[s_i],
            epochs_per_session=epochs_l[s_i], session_seconds=secs[s_i])
        for s_i in range(S)
    ]
    return MultiSeedResult(per_seed=results,
                           seeds=[o.set_seed for o in opts])
