#!/usr/bin/env python
"""Supervised backbone pretraining CLI — flag-compatible counterpart of the
reference entry point (train_supervised.py:38-202).

Golden config (scripts/continual/slurm_run_backbone.sh:30-40):

  python train_supervised.py --trial pretrain --model_path save --tb_path tb \
      --data_root data --classifier linear --model resnet18 \
      --save_freq 100 --continual --no_dropblock --no_linear_bias --set_seed 1
"""

import os
import sys
import time

import numpy as np

from subspace_reg_tpu.config import parse_option_supervised
from subspace_reg_tpu.data.mini_imagenet import load_mini_imagenet
from subspace_reg_tpu.data.tiered_imagenet import load_tiered_imagenet
from subspace_reg_tpu.data.transforms import transforms_options
from subspace_reg_tpu.engine import pretrain as pt
from subspace_reg_tpu.models.factory import create_model
from subspace_reg_tpu.models.head import Head
from subspace_reg_tpu.parallel import mesh as mesh_lib
from subspace_reg_tpu.utils import optim as optim_lib
from subspace_reg_tpu.utils.checkpoint import save_checkpoint
from subspace_reg_tpu.utils.logging import AverageMeter, MetricWriter


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from subspace_reg_tpu.utils.jax_setup import configure as jax_configure
    jax_configure()   # persistent compile cache + TPU hardware RNG

    opt = parse_option_supervised(argv)
    print("************* Training arguments *************")
    for k, v in vars(opt).items():
        print(k, v)
    print("End of arguments.\n")

    np.random.seed(opt.set_seed)

    # ---- data -----------------------------------------------------------
    if opt.dataset == "miniImageNet":
        train_split = load_mini_imagenet(opt, split="train", phase="train")
        val_split = load_mini_imagenet(opt, split="train", phase="val")
        n_cls = 80 if opt.use_trainval else (60 if opt.continual else 64)
    elif opt.dataset == "tieredImageNet":
        train_split = load_tiered_imagenet(opt, partition="train",
                                           phase="train")
        val_split = load_tiered_imagenet(opt, partition="train", phase="val")
        n_cls = 448 if opt.use_trainval else 351
    elif opt.dataset in ("CIFAR-FS", "FC100"):
        # beyond the reference (train_supervised.py:96-97 raises): CIFAR
        # continual pretraining on the shared 60/40 split
        from subspace_reg_tpu.data.cifar import load_cifar, load_cifar_continual
        if opt.continual:
            train_split = load_cifar_continual(opt, split="train",
                                               phase="train")
            val_split = load_cifar_continual(opt, split="train", phase="val")
            n_cls = 60
        else:
            train_split = load_cifar(opt, partition="train")
            val_split = load_cifar(opt, partition="val")
            n_cls = max(train_split.labels) + 1
    else:
        raise NotImplementedError(opt.dataset)

    train_spec, test_spec = transforms_options[opt.transform]
    img_size = train_split.imgs.shape[1]
    train_labels = np.asarray(train_split.labels, np.int32)
    val_labels = np.asarray(val_split.labels, np.int32)
    n_train = len(train_labels)
    steps_per_epoch = n_train // opt.batch_size

    # ---- label-pull embeddings (train_supervised.py:100-118) -----------
    pull_embeds = None
    if opt.label_pull is not None:
        from subspace_reg_tpu.models.embeds import get_embeds
        vocab = [n for n in train_split.label2human if n != ""]
        pth = os.path.join(opt.word_embed_path,
                           f"{opt.dataset}_dim{opt.word_embed_size}.pickle")
        e = np.asarray(get_embeds(pth, vocab, opt.word_embed_size), np.float32)
        if getattr(opt, "glove", False):
            e = e[:, :300]
        pull_embeds = jnp.asarray(e)

    # ---- model / optimizer ---------------------------------------------
    import jax.numpy as jnp
    backbone = create_model(opt.model, n_cls, opt, dataset=opt.dataset,
                            dtype=jnp.bfloat16)
    if opt.cosine:
        sched = optim_lib.cosine_schedule(
            opt.learning_rate, opt.lr_decay_rate, opt.epochs, steps_per_epoch)
    else:
        sched = optim_lib.step_decay_schedule(
            opt.learning_rate, opt.lr_decay_epochs_list, opt.lr_decay_rate,
            steps_per_epoch)
    if opt.adam:
        tx = optim_lib.adam_torch(sched, weight_decay=0.0005)
    else:
        tx = optim_lib.sgd_torch(sched, momentum=opt.momentum,
                                 weight_decay=opt.weight_decay)

    state = pt.init_pretrain_state(
        backbone, jax.random.PRNGKey(opt.set_seed), n_cls, img_size, tx,
        with_bias=opt.linear_bias)

    # mid-run resume (--reload_path): restores params, BN stats, optimizer
    # state and the epoch counter — a capability the reference declares but
    # never implements (configs.py:149)
    start_epoch = 1
    if opt.reload_path:
        from subspace_reg_tpu.utils.checkpoint import load_checkpoint
        variables_r, head_r, meta_r = load_checkpoint(
            opt.reload_path,
            extra_template={"opt_state": state.opt_state,
                            "step": state.step})
        params = {"backbone": variables_r["params"],
                  "head": {"w": head_r.weight[:n_cls]}}
        if opt.linear_bias:
            params["head"]["b"] = head_r.bias[:n_cls]
        state = state.replace(
            params=params, batch_stats=variables_r["batch_stats"],
            counters=variables_r.get("counters", state.counters))
        if "extra" in meta_r and opt.distill not in ("nce", "crd"):
            state = state.replace(opt_state=meta_r["extra"]["opt_state"],
                                  step=meta_r["extra"]["step"])
        # contrastive mode: optimizer state, embed heads and memory banks
        # are restored AFTER init_nce_training (their templates include the
        # embed params and banks) — see the second restore below
        start_epoch = int(meta_r.get("epoch", 0)) + 1
        print(f"==> resumed from {opt.reload_path} at epoch {start_epoch}")

    # ---- optional distillation teacher (KD / NCE / CRD; BASELINE config 5)
    teacher = None
    if opt.distill in ("kd", "nce", "crd"):
        from subspace_reg_tpu.utils.checkpoint import load_any
        assert opt.teacher_path, (
            f"--distill {opt.distill} requires --teacher_path")
        t_vars, t_head, _ = load_any(opt.teacher_path)
        t_name = opt.teacher_model or opt.model
        teacher_backbone = create_model(t_name, int(t_head.n_active), opt,
                                        dataset=opt.dataset,
                                        dtype=jnp.bfloat16)
        if "counters" not in t_vars:
            iv = teacher_backbone.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, img_size, img_size, 3)), train=False)
            t_vars = dict(t_vars)
            t_vars["counters"] = iv["counters"]
        n_t = int(t_head.n_active)
        t_b = (jnp.asarray(t_head.bias[:n_t])
               if t_head.bias is not None else None)
        teacher = (teacher_backbone, t_vars,
                   jnp.asarray(t_head.weight[:n_t]), t_b)
        if opt.distill == "kd":
            # the KL(student||teacher) term subtracts logit rows — a
            # class-count mismatch would otherwise surface as an opaque
            # broadcast TypeError deep inside the jitted step
            assert n_t == n_cls, (
                f"--distill kd needs a teacher trained on the same classes: "
                f"teacher head has {n_t}, this run trains {n_cls}")
            print(f"==> KD teacher: {t_name} ({n_t} classes), "
                  f"T={opt.kd_T} alpha={opt.kd_alpha} beta={opt.kd_beta}")
        else:
            print(f"==> {opt.distill.upper()} teacher: {t_name}, "
                  f"feat_dim={opt.feat_dim} K={opt.nce_k} T={opt.nce_t} "
                  f"m={opt.nce_m} alpha={opt.kd_alpha} beta={opt.kd_beta}")

    # ---- contrastive distillation state (NCE/CRD) ------------------------
    nce_state = None
    if opt.distill in ("nce", "crd"):
        # memory banks are per-dataset-sample: the step needs dataset item
        # indices, so contrastive mode runs on the index-driven input path.
        # Negatives are drawn WITH replacement (dataset/mini_imagenet.py:156)
        # so nce_k may exceed the complement size.  NB: --reload_path resume
        # in contrastive mode restores params/BN but reinitializes the
        # optimizer state and memory banks (they are not checkpointed).
        nce_k = opt.nce_k
        state, embed_s, embed_t, nce_state = pt.init_nce_training(
            jax.random.PRNGKey(opt.set_seed + 1), state, tx,
            teacher_feat_dim=teacher[0].feature_dim,
            student_feat_dim=backbone.feature_dim,
            feat_dim=opt.feat_dim, n_data=n_train, nce_k=nce_k,
            nce_t=opt.nce_t, nce_m=opt.nce_m)
        neg_table = tuple(jax.device_put(a) for a in
                          pt.build_negative_table(train_labels, n_cls))

        # second-phase resume (round 3): optimizer state, embed-head
        # params and the NCE memory banks restore bit-exactly — the
        # reference's Slurm-restart granularity loses all three
        if opt.reload_path:
            from subspace_reg_tpu.utils.checkpoint import load_checkpoint
            _, _, meta_r2 = load_checkpoint(
                opt.reload_path,
                extra_template={"opt_state": state.opt_state,
                                "step": state.step,
                                "embed_s": state.params["embed_s"],
                                "embed_t": state.params["embed_t"],
                                "nce": nce_state})
            extra2 = meta_r2.get("extra", {})
            if "nce" in extra2 and "embed_s" in extra2:
                params2 = dict(state.params)
                params2["embed_s"] = extra2["embed_s"]
                params2["embed_t"] = extra2["embed_t"]
                state = state.replace(params=params2,
                                      opt_state=extra2["opt_state"],
                                      step=extra2["step"])
                nce_state = extra2["nce"]
                print("==> resumed contrastive state "
                      "(optimizer + embed heads + NCE banks)")
            else:
                print("==> WARNING: checkpoint has no contrastive state; "
                      "optimizer/banks start fresh")

    # ---- mesh (data parallel over all local devices) --------------------
    # round 3: contrastive distillation composes with mesh DP — the
    # two-view batch is sharded over the data axis, XLA psums the
    # gradients, and the replicated memory banks stay coherent because the
    # scatter update is expressed on the GLOBAL batch (GSPMD inserts the
    # gather; single-writer per index since dataset items are unique
    # within a batch)
    use_mesh = jax.device_count() > 1
    mesh = mesh_lib.create_mesh() if use_mesh else None
    if mesh is not None:
        state = mesh_lib.replicate_tree(mesh, state)
        if nce_state is not None:
            nce_state = mesh_lib.replicate_tree(mesh, nce_state)
            neg_table = tuple(
                jax.device_put(a, mesh_lib.replicated(mesh))
                for a in neg_table)

    if nce_state is not None:
        train_step = pt.make_train_step_nce(
            backbone, tx, train_spec, with_bias=opt.linear_bias,
            teacher=teacher, embed_s=embed_s, embed_t=embed_t,
            n_data=n_train, nce_k=nce_k, kd_alpha=opt.kd_alpha,
            kd_beta=opt.kd_beta, mode=opt.distill)
    else:
        train_step = pt.make_train_step(
            backbone, tx, train_spec, with_bias=opt.linear_bias,
            label_pull=opt.label_pull, pull_embeds=pull_embeds, mesh=mesh,
            teacher=teacher if opt.distill == "kd" else None,
            kd_temperature=opt.kd_T,
            kd_alpha=opt.kd_alpha, kd_beta=opt.kd_beta)
    eval_step = pt.make_eval_step(
        backbone, test_spec, with_bias=opt.linear_bias,
        truncate_classes=(200 if (opt.dataset == "tieredImageNet"
                                  and opt.augment_pretrain_wtrainb) else None),
        faithful_nbt=opt.faithful_nbt)

    logger = MetricWriter(opt.tb_folder)
    rng_np = np.random.RandomState(opt.set_seed)
    # deterministic resume: consume the skipped epochs' shuffle draws so a
    # --reload_path run reproduces the uninterrupted trajectory exactly
    # (one permutation per epoch, both input paths)
    for _ in range(start_epoch - 1):
        rng_np.permutation(n_train)
    key = jax.random.PRNGKey(opt.set_seed)

    # device-resident dataset: when the uint8 image store fits in HBM,
    # upload it once and gather batches on device — per-step host traffic
    # shrinks to a ~2KB index vector (vital when the host<->chip link is
    # slow; see engine/pretrain.py make_train_step_device_data)
    device_data_max = int(os.environ.get("DEVICE_DATA_MAX_BYTES",
                                         2 * 1024 ** 3))
    use_device_data = train_split.imgs.nbytes <= device_data_max

    def make_epoch_iter(n_train_total):
        """Shuffled tail-dropping index batches (the reference DataLoader's
        shuffle=True, drop_last=True contract, train_supervised.py:49-54)."""
        def epoch_iter():
            order = rng_np.permutation(n_train_total)
            end = (n_train_total // opt.batch_size) * opt.batch_size
            for i in range(0, end, opt.batch_size):
                yield jnp.asarray(order[i:i + opt.batch_size], jnp.int32)
        return epoch_iter

    if use_device_data:
        print(f"==> staging dataset in HBM "
              f"({train_split.imgs.nbytes / 1e6:.0f} MB)"
              + (f" x{mesh.devices.size} devices (replicated store, "
                 f"sharded index gather)" if mesh is not None else ""))
        # under a mesh the uint8 store is replicated per device and the
        # per-step index vector is sharded over the 'data' axis: the gather
        # yields a batch already sharded for DP with zero communication —
        # composing the device-resident dataset with mesh DP (the round-1
        # gap: multi-chip runs regressed to host streaming)
        if mesh is not None:
            repl = mesh_lib.replicated(mesh)
            data_dev = jax.device_put(
                np.ascontiguousarray(train_split.imgs), repl)
            labels_dev = jax.device_put(train_labels, repl)
            val_dev = jax.device_put(
                np.ascontiguousarray(val_split.imgs), repl)
        else:
            data_dev = jax.device_put(np.ascontiguousarray(train_split.imgs))
            labels_dev = jax.device_put(train_labels)
            val_dev = jax.device_put(np.ascontiguousarray(val_split.imgs))
        if nce_state is None:
            step_dd = pt.make_train_step_device_data(
                backbone, tx, train_spec, with_bias=opt.linear_bias,
                label_pull=opt.label_pull, pull_embeds=pull_embeds,
                mesh=mesh,
                teacher=teacher if opt.distill == "kd" else None,
                kd_temperature=opt.kd_T,
                kd_alpha=opt.kd_alpha, kd_beta=opt.kd_beta)
        epoch_iter = make_epoch_iter(len(train_labels))
        loader = None
        val_imgs_for_eval = val_dev
    elif nce_state is not None:
        # contrastive mode needs dataset item indices: index-driven host
        # gather (the reference DataLoader's (img, target, item, sample_idx)
        # tuple, dataset/mini_imagenet.py:161-163)
        epoch_iter = make_epoch_iter(len(train_labels))
        loader = None
        val_imgs_for_eval = val_split.imgs
    else:
        from subspace_reg_tpu.data.pipeline import PrefetchLoader
        loader = PrefetchLoader(train_split.imgs, train_labels,
                                opt.batch_size, rng_np)
        val_imgs_for_eval = val_split.imgs

    def save(epoch, final=False):
        meta = {}
        if opt.continual:
            meta["training_classes"] = train_split.basec_map
            meta["label2human"] = train_split.label2human
        meta["epoch"] = epoch
        variables = {"params": state.params["backbone"],
                     "batch_stats": state.batch_stats,
                     "counters": state.counters}
        w = np.asarray(state.params["head"]["w"])
        b = (np.asarray(state.params["head"]["b"])
             if opt.linear_bias else None)
        head = Head(weight=jnp.asarray(w),
                    bias=jnp.asarray(b) if b is not None else None,
                    n_active=jnp.asarray(n_cls, jnp.int32))
        name = (f"{opt.model}_last.ckpt" if final
                else f"ckpt_epoch_{epoch}.ckpt")
        extra = {"opt_state": state.opt_state, "step": state.step}
        if nce_state is not None:
            # contrastive training state: embed heads + memory banks, so
            # --reload_path resumes bit-exactly (reference counterpart:
            # distill/NCEAverage.py banks, lost on any Slurm restart)
            extra["embed_s"] = state.params["embed_s"]
            extra["embed_t"] = state.params["embed_t"]
            extra["nce"] = nce_state
        save_checkpoint(os.path.join(opt.save_folder, name),
                        variables, head, meta, extra=extra)
        print("==> Saved", name)

    # ---- training loop (train_supervised.py:156-202) --------------------
    for epoch in range(start_epoch, opt.epochs + 1):
        if not opt.eval_only:
            print("==> training...")
            t0 = time.time()
            lm, a1m, a5m = AverageMeter(), AverageMeter(), AverageMeter()
            n_img = 0
            if use_device_data or nce_state is not None:
                batches = ((idxs, None) for idxs in epoch_iter())
            else:
                batches = loader.epoch()
            for bi, item in enumerate(batches):
                if nce_state is not None:
                    idxs, _ = item
                    if mesh is not None:
                        idxs = mesh_lib.shard_batch(mesh, idxs)
                    if use_device_data:
                        state, nce_state, m = train_step.device_data(
                            state, nce_state, data_dev, labels_dev,
                            neg_table, idxs, key)
                    else:
                        hi = np.asarray(idxs)
                        xb = jnp.asarray(train_split.imgs[hi])
                        yb = jnp.asarray(train_labels[hi], jnp.int32)
                        if mesh is not None:
                            xb, yb = mesh_lib.shard_batch(mesh, xb, yb)
                        state, nce_state, m = train_step(
                            state, nce_state, xb, yb,
                            idxs, neg_table, key)
                    bsz = int(idxs.shape[0])
                elif use_device_data:
                    idxs, _ = item
                    if mesh is not None:
                        idxs = mesh_lib.shard_batch(mesh, idxs)
                    state, m = step_dd(state, data_dev, labels_dev,
                                       idxs, key)
                    bsz = int(idxs.shape[0])
                else:
                    x, y = item
                    if mesh is not None:
                        x, y = mesh_lib.shard_batch(mesh, x, y)
                    state, m = train_step(state, x, y, key)
                    bsz = int(x.shape[0])
                n_img += bsz
                if bi % opt.print_freq == 0:
                    lm.update(float(m["loss"]), bsz)
                    a1m.update(float(m["acc1"]), bsz)
                    a5m.update(float(m["acc5"]), bsz)
                    print(f"Epoch: [{epoch}][{bi}/{steps_per_epoch}]\t"
                          f"Loss {lm.val:.4f} ({lm.avg:.4f})\t"
                          f"Acc@1 {a1m.val:.3f} ({a1m.avg:.3f})\t"
                          f"Acc@5 {a5m.val:.3f} ({a5m.avg:.3f})")
                    sys.stdout.flush()
            _ = float(m["loss"])   # drain the dispatch pipeline before timing
            dt = time.time() - t0
            ips = n_img / dt
            print(f"epoch {epoch}, total time {dt:.2f}, "
                  f"images/sec {ips:.1f}")
            print(f" * Acc@1 {a1m.avg:.3f} Acc@5 {a5m.avg:.3f}")
            logger.log_value("train_acc", a1m.avg, epoch)
            logger.log_value("train_loss", lm.avg, epoch)
            logger.log_value("images_per_sec", ips, epoch)

        vm = pt.run_validation(eval_step, state, val_imgs_for_eval,
                               val_labels, opt.batch_size // 2)
        if opt.faithful_nbt:
            vm, state = vm
        print(f" * Val Acc@1 {vm['acc1']:.3f} Acc@5 {vm['acc5']:.3f}")
        logger.log_value("test_acc", vm["acc1"], epoch)
        logger.log_value("test_acc_top5", vm["acc5"], epoch)
        logger.log_value("test_loss", vm["loss"], epoch)

        if epoch % opt.save_freq == 0:
            save(epoch)

    save(opt.epochs, final=True)
    logger.close()
    return state


if __name__ == "__main__":
    main()
