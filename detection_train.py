"""Train CLI: python detection_train.py --config config/<experiment>.py

The TPU rewrite of the reference detection_train.py:19-294: config drives
everything; the loop is a jit-compiled train step over the device mesh with
in-graph target generation, Speedometer logging, per-epoch checkpoints by
process 0, and pretrain bootstrapping with allow_missing.
"""
import argparse
import os
import time

import numpy as np


def train_net(config_path, max_iter_override=None, auto_resume=False,
              loss_history=None):
    """loss_history: optional list; when given, every drained step's scalar
    losses are appended as {name: float} dicts (convergence tests assert
    windowed loss decrease on it without parsing the log)."""
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.checkpoint import (get_latest_ckpt_epoch,
                                               load_checkpoint, load_pretrain,
                                               save_checkpoint)
    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.metrics import CompositeMetric
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.schedule import warmup_multifactor
    from simpledet_tpu.core.train import TrainState, make_train_step
    from simpledet_tpu.data.loader import Loader
    from simpledet_tpu.data.roidb import append_flipped, load_roidb
    from simpledet_tpu.parallel.mesh import make_mesh, shard_batch
    from simpledet_tpu.utils.logger import Speedometer, config_logger

    from simpledet_tpu.core.config import patch_all

    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    # multi-host: one mechanism replaces the reference's kvstore/PS stack
    # (doc/DISTRIBUTED.md) — initialize the global mesh when on a pod slice.
    # SIMPLEDET_DISTRIBUTED=1 auto-detects (TPU pod metadata);
    # SIMPLEDET_DISTRIBUTED=<coordinator:port>,<num_processes>,<process_id>
    # is the explicit form (CPU multi-process, tests/test_distributed.py)
    dist_spec = os.environ.get("SIMPLEDET_DISTRIBUTED")
    if dist_spec:
        # generous shutdown barrier: ranks compile/run serially on loaded
        # hosts (the 1-core CI box) and the 300 s default kills the fast
        # rank while a slow one is still mid-epoch
        shutdown_s = int(os.environ.get("SIMPLEDET_DIST_SHUTDOWN_S", "900"))
        if "," in dist_spec:
            addr, nproc, pid = dist_spec.split(",")
            jax.distributed.initialize(coordinator_address=addr,
                                       num_processes=int(nproc),
                                       process_id=int(pid),
                                       shutdown_timeout_seconds=shutdown_s)
        else:
            jax.distributed.initialize(
                shutdown_timeout_seconds=shutdown_s)

    cfg = load_config(config_path)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=True)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam) = patch_all(
        General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
        ModelParam, OptimizeParam, TestParam)

    exp_dir = os.path.join("experiments", General.name)
    logger = config_logger(exp_dir)
    logger.info(f"config: {config_path}")

    devices = jax.devices()
    n_dev = len(devices)
    batch_per_dev = General.batch_image
    global_batch = batch_per_dev * n_dev
    # each process loads only the rows for its local devices; the global
    # batch is assembled from per-process shards (parallel/mesh.shard_batch)
    local_batch = batch_per_dev * jax.local_device_count()
    logger.info(f"{n_dev} devices ({jax.process_count()} processes), "
                f"global batch {global_batch}")

    # data ------------------------------------------------------------------
    roidb = load_roidb(DatasetParam.image_set,
                       DatasetParam.cache_dir or "data/cache")
    roidb = [r for r in roidb if len(r.get("gt_bbox", []))]
    roidb = append_flipped(roidb)
    logger.info(f"{len(roidb)} records (with flips)")
    # batch keys: data + whatever labels the config declares (e.g. gt_poly).
    # teacher_label is synthesized by the teacher forward, not the loader.
    keys = tuple(k for k in dict.fromkeys(
        ["data", "im_info", "gt_bbox"] + list(label_name or []))
        if k != "teacher_label")
    loader = Loader(roidb, transform, local_batch, shuffle=True,
                    num_workers=General.loader_worker or 8,
                    rank=jax.process_index(), num_ranks=jax.process_count(),
                    keys=keys)

    # model -----------------------------------------------------------------
    model = ModelParam.train_symbol
    rng = jax.random.PRNGKey(0 if not ModelParam.random else int(time.time()))
    sample0 = next(iter(Loader(roidb[:global_batch], transform, 1,
                               shuffle=False, num_workers=0, keys=keys)))
    # abstract global-batch spec (PRE-normalization dtypes: training
    # batches stay uint8 until the in-step device_normalize) — used by the
    # compile-only memonger budget planner below
    batch_sds = {k: jax.ShapeDtypeStruct(
        (global_batch,) + np.asarray(v).shape[1:], np.asarray(v).dtype)
        for k, v in sample0.items() if k != "valid"}
    extra0 = {k: jnp.asarray(v) for k, v in sample0.items()
              if k not in ("data", "im_info", "gt_bbox", "valid")}
    # deferred Norm2DImage: loader batches are uint8; init/teacher inputs
    # are normalized here, training batches inside the jitted step
    from simpledet_tpu.ops.image import device_normalize, find_pixel_norm
    pixel_norm = find_pixel_norm(transform)
    if pixel_norm is not None:
        sample0["data"] = device_normalize(
            jnp.asarray(sample0["data"]), jnp.asarray(sample0["im_info"]),
            *pixel_norm)

    # KD: frozen teacher producing the teacher_label input per batch
    # (reference detection_train.py:172-184 + models/KD/detection_module.py:48)
    teacher_fn = None
    if ModelParam.teacher_param and ModelParam.teacher_param.backbone \
            is not None:
        from simpledet_tpu.models.kd import create_teacher_fn
        teacher_fn = create_teacher_fn(ModelParam.teacher_param,
                                       jnp.asarray(sample0["data"]), logger)
        extra0["teacher_label"] = teacher_fn(jnp.asarray(sample0["data"]))
    # jit the init: one compiled program instead of hundreds of eager op
    # dispatches (an order of magnitude faster for fresh model shapes)
    init_fn = jax.jit(lambda rngs, d, ii, gt, ex:
                      model.init(rngs, d, ii, gt, mode="train", **ex))
    variables = init_fn(
        {"params": rng, "sampling": jax.random.fold_in(rng, 1)},
        jnp.asarray(sample0["data"]), jnp.asarray(sample0["im_info"]),
        jnp.asarray(sample0["gt_bbox"]), extra0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats") or None  # SyncBN running stats
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"{n_params / 1e6:.1f}M params")

    begin_epoch = OptimizeParam.schedule.begin_epoch
    end_epoch = OptimizeParam.schedule.end_epoch
    prefix = os.path.join(exp_dir, "checkpoint")
    if auto_resume:
        # --resume: continue from the newest checkpoint without editing the
        # config (reference recovery = manual begin_epoch edit, SURVEY §5)
        latest = get_latest_ckpt_epoch(prefix)
        if latest is not None:
            begin_epoch = max(begin_epoch, latest)
    resume_opt_state = resume_step = None
    if begin_epoch > 0:
        params, resume_opt_state, resume_step = load_checkpoint(
            prefix, begin_epoch, params)
        logger.info(f"resumed from epoch {begin_epoch}"
                    + (" (with optimizer state)" if resume_opt_state is not None
                       else ""))
    elif not ModelParam.from_scratch:
        try:
            params, n_hit = load_pretrain(params, ModelParam.pretrain.prefix,
                                          ModelParam.pretrain.epoch or 0)
            logger.info(f"loaded pretrain ({n_hit} tensors)")
        except FileNotFoundError:
            logger.info("no pretrain found, training from random init")

    # optimizer --------------------------------------------------------------
    # iter_per_epoch: config override or derived from the (rank-sharded)
    # loader, like the reference's len(train_data) (detection_train.py:199)
    iter_per_epoch = (OptimizeParam.schedule.iter_per_epoch
                      or max(len(loader), 1))
    total_iter = iter_per_epoch * (end_epoch or 1)
    # multi-worker linear scaling (reference detection_train.py:196-213)
    from simpledet_tpu.core.schedule import apply_dp_scaling
    base_lr, lr_iter, warm_iter = apply_dp_scaling(
        OptimizeParam.optimizer.lr, OptimizeParam.schedule.lr_iter or [],
        OptimizeParam.warmup.iter or 0, jax.process_count(),
        total_iter=total_iter, warmup_in_pct=bool(OptimizeParam.warmup.in_pct))
    # schedules live in GLOBAL iteration space; on resume the optimizer step
    # count is restored (or fast-forwarded), so no begin_epoch offset is
    # subtracted from the boundaries (unlike reference :203, whose optimizer
    # always restarts at 0)
    lr_mode = OptimizeParam.schedule.lr_mode  # None | cosine | poly | linear
    if lr_mode:
        # AdvancedLRScheduler analog (reference utils/lr_scheduler.py:92):
        # warmup then cosine/poly/linear decay over the full run
        from simpledet_tpu.core.schedule import advanced, sequential
        warm = warmup_multifactor(
            base_lr, [],
            warmup_type=OptimizeParam.warmup.type or "gradual",
            warmup_lr=OptimizeParam.warmup.lr, warmup_iter=warm_iter)
        sched = sequential(
            [warm, advanced(base_lr, max(total_iter - warm_iter, 1),
                            mode=lr_mode)],
            [warm_iter])
    else:
        sched = warmup_multifactor(
            base_lr, lr_iter,
            warmup_type=OptimizeParam.warmup.type or "gradual",
            warmup_lr=OptimizeParam.warmup.lr,
            warmup_iter=warm_iter)
    logger.info(f"iter_per_epoch {iter_per_epoch}, total_iter {total_iter}, "
                f"lr {base_lr}, lr_iter {lr_iter}, warmup_iter {warm_iter}")
    mask = freeze_mask(params, ModelParam.pretrain.fixed_param or [],
                       ModelParam.pretrain.excluded_param)
    tx = make_optimizer(sched,
                        opt_type=OptimizeParam.optimizer.type or "sgd",
                        momentum=OptimizeParam.optimizer.momentum or 0.9,
                        wd=OptimizeParam.optimizer.wd or 0.0,
                        clip_gradient=OptimizeParam.optimizer.clip_gradient,
                        trainable_mask=mask)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                              batch_stats=batch_stats)
    if begin_epoch > 0 and batch_stats is not None:
        from simpledet_tpu.core.checkpoint import load_batch_stats
        restored_bs = load_batch_stats(prefix, begin_epoch, batch_stats)
        if restored_bs is not None:
            state = state.replace(batch_stats=restored_bs)
    if resume_opt_state is not None:
        # full resume: momentum buffers + schedule position
        # (reference core/detection_module.py:813-842 load_states)
        step0 = (resume_step if resume_step is not None
                 else begin_epoch * iter_per_epoch)
        state = state.replace(opt_state=resume_opt_state, step=step0)
    elif begin_epoch > 0:
        # params-only checkpoint: fresh optimizer, but fast-forward the
        # schedule so warmup isn't replayed and decay boundaries hold
        import optax.tree_utils as otu
        step0 = begin_epoch * iter_per_epoch
        opt_state = otu.tree_set(state.opt_state,
                                 count=jnp.asarray(step0, jnp.int32))
        state = state.replace(opt_state=opt_state, step=step0)

    # INT8 QAT (reference detection_train.py:145-152): wrap the forward in
    # fake-quant on conv/dense inputs + kernels
    quantize = None
    qp = ModelParam.QuantizeTrainingParam
    if ModelParam.quantize_flag or (qp is not None and qp.quantize_flag):
        assert not General.fp16, "quantize training only supports fp32 mode"
        quantize = {}
        if qp is not None and qp.WeightQuantizeParam is not None \
                and qp.WeightQuantizeParam.power2:
            quantize["power2"] = True
        logger.info("INT8 QAT enabled: fake-quant on conv/dense io+kernels")

    mesh = make_mesh(devices)
    # memonger_until targets remat at a named backbone stage (reference
    # detection_train.py:118-124 + utils/memonger_v2.py:171); plain
    # memonger uses the global dots-saveable policy
    remat = False
    if ModelParam.memonger:
        remat = ModelParam.memonger_until or True
    elif ModelParam.memonger_budget_gb:
        # automatic plan search to a budget (reference
        # utils/memonger_v2.py:226 search_plan_to_layer): compile-only
        # bisection over remat policies using XLA's buffer assignment
        from simpledet_tpu.core.memonger import plan_remat
        if "teacher_label" in extra0:
            t0 = extra0["teacher_label"]
            batch_sds["teacher_label"] = jax.ShapeDtypeStruct(
                (global_batch,) + t0.shape[1:], t0.dtype)
        mk = lambda setting: make_train_step(
            model, mesh=mesh, remat=setting, quantize=quantize,
            pixel_norm=pixel_norm)
        remat, peak, _ = plan_remat(
            mk, state, batch_sds, jax.random.PRNGKey(0),
            int(float(ModelParam.memonger_budget_gb) * 2 ** 30),
            logger=logger)
        logger.info(
            f"memonger budget {ModelParam.memonger_budget_gb} GiB -> "
            f"remat={remat!r}"
            + (f" (peak {peak / 2**30:.2f} GiB)" if peak else ""))
    step_fn = make_train_step(model, mesh=mesh, remat=remat,
                              quantize=quantize, pixel_norm=pixel_norm)
    if jax.process_count() > 1:
        # Cross-process collectives establish their transport (gloo on CPU)
        # lazily at the FIRST sharded execution, with a short rendezvous
        # window — if one process is still compiling while another already
        # executes, the connect times out. So: AOT-compile the step here
        # (arbitrarily slow, populates the persistent cache), then hold
        # every process at a coordination-service barrier (pure RPC, long
        # timeout). After the barrier all processes re-enter the jit from
        # cache within seconds of each other and the transport connects in
        # lockstep.
        if teacher_fn is not None and "teacher_label" not in batch_sds:
            t0s = extra0["teacher_label"]
            batch_sds["teacher_label"] = jax.ShapeDtypeStruct(
                (global_batch,) + t0s.shape[1:], t0s.dtype)
        logger.info("multi-process: AOT-compiling the sharded train step")
        step_fn.lower(state, batch_sds, jax.random.PRNGKey(0)).compile()
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier(
            "simpledet_train_start", timeout_in_ms=1800 * 1000)
        logger.info("multi-process: all processes at start barrier")
    metrics = CompositeMetric(metric_list)
    # General.detail_log switches to the data/compute-split speedometer
    # (reference utils/callback.py:40 DetailSpeedometer)
    if General.detail_log:
        from simpledet_tpu.utils.logger import DetailSpeedometer
        speedo = DetailSpeedometer(global_batch, General.log_frequency or 10,
                                   logger)
    else:
        speedo = Speedometer(global_batch, General.log_frequency or 10,
                             logger)
    # optional aux subsystems: profiler window (reference MXNet profiler on
    # batches 1-10, detection_train.py:274-276 / detection_module.py:998),
    # scalar summaries (mxboard analog), iter-granular checkpoints
    # (utils/callback.py:96 do_checkpoint_iter)
    profile = bool(General.profile)
    writer = None
    if General.summary:
        from simpledet_tpu.utils.logger import SummaryWriter
        writer = SummaryWriter(exp_dir)
    ckpt_iter = General.checkpoint_iter  # e.g. 5000 -> save every 5k iters

    step_rng = jax.random.PRNGKey(42)
    n_iter = int(state.step)
    steps_this_run = 0
    pending = None  # previous iter's device outputs — one-step-lagged metric
    # accumulation keeps running means (reference detection_module.py:1009)
    # without forcing a host sync on the just-dispatched step

    def drain_pending():
        nonlocal pending
        if pending is None:
            return
        p_losses, p_aux = pending
        # host_local: per-process rows for batch-sharded aux (per-rank
        # metrics like the reference), local replica for replicated losses
        from simpledet_tpu.parallel.mesh import host_local
        aux_host = host_local(p_aux)
        aux_host.update(host_local(p_losses))
        metrics.update(aux_host)
        if loss_history is not None:
            loss_history.append({k: float(np.mean(v)) for k, v in
                                 host_local(p_losses).items()})
        pending = None

    detail = bool(General.detail_log)

    def fetch_and_stage(it):
        """Next host batch -> device shards. Called right after the step is
        DISPATCHED, so the H2D copy (and the KD teacher forward) overlap
        with the running step — the device-side prefetch analog of the
        reference's next_data_batch (core/detection_module.py:1016-1021)."""
        batch = next(it, None)
        if batch is None:
            return None
        batch.pop("valid", None)
        if teacher_fn is not None:
            tdata = jnp.asarray(batch["data"])
            if pixel_norm is not None:
                tdata = device_normalize(tdata, jnp.asarray(batch["im_info"]),
                                         *pixel_norm)
            batch["teacher_label"] = teacher_fn(tdata)
        return shard_batch(batch, mesh)

    for epoch in range(begin_epoch, end_epoch):
        logger.info(f"starting epoch {epoch}")
        it = iter(loader)
        if detail:
            speedo.tic_data()
        staged = fetch_and_stage(it)
        if detail and staged is not None:
            speedo.toc_data()
        while True:
            if staged is None:
                break
            dev_batch = staged
            if profile and steps_this_run == 1:
                jax.profiler.start_trace(os.path.join(exp_dir, "profile"))
            state, losses, aux = step_fn(state, dev_batch,
                                         jax.random.fold_in(step_rng, n_iter))
            n_iter += 1
            steps_this_run += 1
            # stage the NEXT batch while this step runs on device
            if detail:
                speedo.tic_data()
            staged = fetch_and_stage(it)
            if detail:
                speedo.toc_data()
            if profile and steps_this_run == 10:
                jax.tree.map(lambda x: x.block_until_ready(), losses)
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written to {exp_dir}/profile")
            drain_pending()
            pending = (losses, aux)
            if detail:
                speedo.toc_step()
            if n_iter % (General.log_frequency or 10) == 0:
                drain_pending()
                if writer:
                    for name, val in metrics.get():
                        writer.add_scalar(f"train/{name}", val, n_iter)
                speedo(epoch, n_iter, metrics, lr=float(sched(n_iter)))
            else:
                speedo(epoch, n_iter)
            if ckpt_iter and n_iter % ckpt_iter == 0:
                save_checkpoint(prefix + "_iter", n_iter, state.params,
                                state.opt_state, step=state.step,
                                batch_stats=state.batch_stats)
            if max_iter_override and steps_this_run >= max_iter_override:
                break
        drain_pending()
        # checkpoint_period: save every N epochs (always the final epoch and
        # on early break); tiny-epoch convergence runs would otherwise spend
        # most of their time serializing params
        period = General.checkpoint_period or 1
        stopping = ((epoch + 1 == end_epoch)
                    or (max_iter_override
                        and steps_this_run >= max_iter_override))
        if (epoch + 1) % period == 0 or stopping:
            save_checkpoint(prefix, epoch + 1, state.params, state.opt_state,
                            step=state.step, batch_stats=state.batch_stats)
            logger.info(f"saved checkpoint epoch {epoch + 1}")
        if max_iter_override and steps_this_run >= max_iter_override:
            break
    logger.info("training done")
    return state


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-iter", type=int, default=None,
                    help="stop early (smoke tests)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in experiments/")
    args = ap.parse_args()
    train_net(args.config, args.max_iter, auto_resume=args.resume)
