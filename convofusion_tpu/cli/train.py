"""Training entry point.

Reference: train.py (parse cfg -> logger -> resume scan -> datasets ->
model -> Trainer.fit with DDP).  TPU equivalent: ('data','model') mesh,
jitted optax step, orbax checkpoints, stage-1 -> stage-2 VAE transplant.

Run: python -m convofusion_tpu.cli.train --cfg <yaml> [key=value ...]
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from convofusion_tpu.config import parse_args
    from convofusion_tpu.data.datamodule import get_datasets
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.parallel.mesh import create_mesh
    from convofusion_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
        transplant_vae,
        wait_for_checkpoints,
    )
    from convofusion_tpu.callback.progress import ProgressLogger
    from convofusion_tpu.train.trainer import Trainer
    from convofusion_tpu.utils.logger import create_logger
    from convofusion_tpu.utils.metrics_logger import (
        MetricsLogger,
        aggregate_terms,
    )

    cfg = parse_args("train", argv)
    from convofusion_tpu.utils.jaxsetup import setup_jax

    setup_jax(cfg)
    # multi-host SPMD: every host runs this script; jax.distributed wires
    # the DCN mesh (reference scale-out was single-host Lightning DDP)
    if bool(cfg.get("TPU", {}).get("MULTIHOST", False)):
        jax.distributed.initialize()
    # side outputs (wandb run, metrics jsonl/TB, checkpoint writes) come
    # from process 0 only: N hosts sharing an experiment dir must not
    # create N wandb runs or race on the epoch= dir force-delete
    is_main = jax.process_index() == 0
    logger = create_logger(cfg, "train")
    metrics = MetricsLogger(
        cfg.FOLDER_EXP,
        enable_wandb=not bool(cfg.LOGGER.WANDB.get("OFFLINE", True)),
        wandb_project=cfg.LOGGER.WANDB.get("PROJECT"),
        wandb_resume_id=cfg.LOGGER.WANDB.get("RESUME_ID"),
    ) if is_main else None
    logger.info(f"stage={cfg.TRAIN.STAGE} name={cfg.NAME}")

    datamodule = get_datasets(cfg)[0]
    model = Convofusion(cfg)

    n_dev = jax.local_device_count()
    if n_dev > 1 and int(cfg.TRAIN.BATCH_SIZE) % n_dev == 0:
        mesh = create_mesh()
        logger.info(f"data-parallel mesh over {n_dev} devices")
    else:
        mesh = None
        if jax.process_count() > 1:
            # without the global mesh there is no gradient all-reduce:
            # every host would silently train its own divergent model on
            # 1/n of the data and race on the checkpoint dir
            raise ValueError(
                f"multi-host training needs TRAIN.BATCH_SIZE divisible "
                f"by the {n_dev} local devices (and >1 local device); "
                f"got {cfg.TRAIN.BATCH_SIZE}")
        if n_dev > 1:
            logger.warning(
                f"batch size {cfg.TRAIN.BATCH_SIZE} not divisible by "
                f"{n_dev} devices; running single-device")
    if jax.process_count() > 1 and \
            int(cfg.LOGGER.get("VAL_EVERY_STEPS", 0) or 0) and \
            int(cfg.EVAL.BATCH_SIZE) % n_dev != 0:
        raise ValueError(
            f"multi-host validation needs EVAL.BATCH_SIZE divisible by "
            f"the {n_dev} local devices; got {cfg.EVAL.BATCH_SIZE}")

    trainer = Trainer(model, cfg, mesh=mesh)
    key = jax.random.PRNGKey(int(cfg.SEED_VALUE))
    key, k_init = jax.random.split(key)
    params, opt_state = trainer.init_state(k_init)
    # real t5-base weights auto-activate from the asset drop
    # (utils/assets.py), mirroring the reference's from_pretrained
    from convofusion_tpu.train.checkpoint import maybe_load_t5_assets

    params = maybe_load_t5_assets(params)

    ckpt_dir = os.path.join(cfg.FOLDER_EXP, "checkpoints")
    start_epoch = int(cfg.TRAIN.START_EPOCH)

    resume = latest_checkpoint(ckpt_dir) if cfg.TRAIN.RESUME else None
    if resume:
        logger.info(f"resuming from {resume}")
        params, restored_opt = load_checkpoint(
            resume, params, opt_state_template=opt_state)
        if restored_opt is not None:
            opt_state = restored_opt
        start_epoch = int(os.path.basename(resume).split("=")[1]) + 1
    elif cfg.TRAIN.PRETRAINED_VAE and cfg.TRAIN.STAGE != "vae":
        logger.info(f"loading pretrained VAE {cfg.TRAIN.PRETRAINED_VAE}")
        params = transplant_vae(params, str(cfg.TRAIN.PRETRAINED_VAE))

    step_fn = trainer.make_train_step()
    save_every = int(cfg.LOGGER.SACE_CHECKPOINT_EPOCH)
    progress = ProgressLogger(logger)

    def aggregate(term_dicts, split: str):
        """Epoch aggregation (utils/metrics_logger.aggregate_terms) after
        one device->host transfer for the whole epoch's terms, not one
        blocking sync per term per step."""
        return aggregate_terms(jax.device_get(term_dicts), split)

    # frozen-trunk activation cache: the T5 trunk never trains and runs
    # in eval mode (t5.py:35-37), so per-text trunk outputs are immutable
    # — cache them host-side and feed activations instead of ids, which
    # removes the 12-layer T5 forward x 2 streams (~3/4 of step FLOPs)
    # from the train step (models/convofusion.py encode_text_trunk)
    use_trunk_cache = (
        cfg.TRAIN.STAGE != "vae"
        and bool(cfg.get("TPU", {}).get("CACHE_TEXT_TRUNK", True))
        and float(model.text_encoder.dropout) == 0.0)
    if use_trunk_cache:
        from convofusion_tpu.models.text_cache import TextEmbeddingCache
        from convofusion_tpu.models.tokenizer import UNCOND_TEXT

        # the train step donates param buffers, so keep a private device
        # copy of the (frozen) text params for the cache-miss encoder
        text_params = {"text_encoder": jax.tree_util.tree_map(
            jnp.array, params["text_encoder"])}
        trunk_jit = jax.jit(model.encode_text_trunk)
        tcache = TextEmbeddingCache()

        def _encode_missing(texts):
            # pad the miss batch to a power-of-two bucket: as the cache
            # warms, misses arrive in every size from 1..B, and each
            # distinct batch shape is a fresh trunk compile (observed
            # 20-50 s per shape on a 1-CPU host); log2 buckets bound it
            n = len(texts)
            m = 1 << max(0, (n - 1).bit_length())
            padded = list(texts) + [texts[-1]] * (m - n)
            tb = model.tokenize(padded)
            trunk = trunk_jit(text_params, jnp.asarray(tb.input_ids),
                              jnp.asarray(tb.attention_mask))
            return (np.asarray(trunk)[:n],
                    np.asarray(tb.attention_mask)[:n])

        logger.info("frozen-T5 trunk cache enabled (TPU.CACHE_TEXT_TRUNK)")

    # frozen-VAE posterior cache: in the diffusion stage the VAE never
    # trains, so each sample's (mu, logvar) is immutable — cache per name
    # and draw only the reparameterization noise in-step (bit-identical
    # loss: models/convofusion.py train_diffusion_loss cached branch).
    # Removes the chunked VAE encoder (tiny d=128 GEMMs the MXU hates)
    # from the hot loop.  TPU.CACHE_VAE_POSTERIOR=0 disables.
    # STRICTLY the pure-diffusion stage: in 'vae_diffusion' the VAE is
    # trainable, so its posterior is not a constant of the motion
    use_vae_cache = (
        cfg.TRAIN.STAGE == "diffusion"
        and model.vae is not None
        and bool(cfg.get("TPU", {}).get("CACHE_VAE_POSTERIOR", True)))
    if use_vae_cache:
        import hashlib

        vae_params = {"vae": jax.tree_util.tree_map(
            jnp.array, params["vae"])}
        posterior_jit = jax.jit(model.encode_vae_posterior)
        pcache: dict = {}
        # bound host RAM: each entry is ~8 KB of (mu, logvar); random
        # listener picks mint new content keys every epoch, so without a
        # cap the cache grows unboundedly over a long run
        pcache_cap = int(
            cfg.get("TPU", {}).get("VAE_POSTERIOR_CACHE_CAP", 16384))

        def _pkey(name, motion_row):
            # key on CONTENT, not just name: multi-listener entries pick
            # a random listener per epoch (data/dataset.py __getitem__
            # randrange, mirroring the reference), so the same name can
            # carry different motion across epochs.  Hash the FULL row —
            # SHA-1 over ~96 KB is negligible next to the encode it
            # replaces, and a sampled-frame hash could silently alias
            # two different motions to one posterior.
            dig = hashlib.sha1(
                np.ascontiguousarray(motion_row).tobytes()
            ).hexdigest()[:16]
            return f"{name}|{dig}"

        def _posteriors(names, motion):
            motion = np.asarray(motion)
            keys = [_pkey(n, motion[i]) for i, n in enumerate(names)]
            if any(k not in pcache for k in keys):
                # encode the whole batch once (static shape -> one
                # compile) and keep per-sample slices
                mu, lv = posterior_jit(vae_params, jnp.asarray(motion))
                mu, lv = np.asarray(mu), np.asarray(lv)
                if len(pcache) + len(keys) > pcache_cap:
                    pcache.clear()
                for i, k in enumerate(keys):
                    pcache[k] = (mu[i], lv[i])
            return (np.stack([pcache[k][0] for k in keys]),
                    np.stack([pcache[k][1] for k in keys]))

        logger.info(
            "frozen-VAE posterior cache enabled (TPU.CACHE_VAE_POSTERIOR)")

    # multi-host: keep batches as host numpy until shard_batch assembles
    # the global arrays — jnp.asarray here would stage onto the local
    # device only to be pulled back for make_array_from_process_local_data
    multihost = jax.process_count() > 1
    to_dev = np.asarray if multihost else jnp.asarray

    def prepare(batch):
        if cfg.TRAIN.STAGE == "vae":
            return {"motion": to_dev(batch["motion"])}
        arrays = {
            "melspec_lsn": to_dev(batch["melspec_lsn"]),
            "active_passive_lsn": to_dev(batch["active_passive_lsn"]),
            "lsn_id": to_dev(batch["lsn_id"]),
        }
        if use_vae_cache:
            mu, lv = _posteriors(list(batch["name"]), batch["motion_lsn"])
            arrays.update(vae_mu=to_dev(mu), vae_logvar=to_dev(lv))
        else:
            arrays["motion_lsn"] = to_dev(batch["motion_lsn"])
        if use_trunk_cache:
            # the cache carries its own masks — no per-batch tokenizer
            # run and no unused id arrays shipped to the device; the
            # uncond row stays (1, T, D), broadcast inside the step
            pad = model.text_pad_len
            spk_t, spk_m = tcache.encode_batch(
                list(batch["text_spk"]), pad, _encode_missing)
            lsn_t, lsn_m = tcache.encode_batch(
                list(batch["text_lsn"]), pad, _encode_missing)
            unc_t, unc_m = tcache.encode_batch(
                [UNCOND_TEXT], pad, _encode_missing)
            arrays.update(
                spk_trunk=to_dev(spk_t), spk_tmask=to_dev(spk_m),
                lsn_trunk=to_dev(lsn_t), lsn_tmask=to_dev(lsn_m),
                uncond_trunk=to_dev(unc_t), uncond_tmask=to_dev(unc_m))
        else:
            text_arrays, _, _ = model.prepare_text_batch(
                batch["text_spk"], batch["text_lsn"])
            arrays.update(text_arrays)
        return arrays

    # background input pipeline: host collate/tokenize/device_put for
    # batch N+1 overlaps the device's step N (train/prefetch.py)
    from convofusion_tpu.train.prefetch import prefetch

    prefetch_depth = int(cfg.get("TPU", {}).get("PREFETCH", 2))

    def stage(batch):
        return trainer.shard_batch(prepare(batch))

    # multi-host: each process loads a disjoint stride of the epoch
    # (DistributedSampler semantics); shard_batch assembles global arrays
    host_shard = ((jax.process_index(), jax.process_count())
                  if jax.process_count() > 1 else None)

    # multi-host: never let one host execute a collective program while
    # another is still compiling it — compile-cache skew exceeds gloo's
    # ~30 s rendezvous window (parallel/mesh.compile_synced). The AOT
    # executable is shape-specialized; shapes are static here
    # (drop_last train loader, fixed pad lengths).
    from convofusion_tpu.parallel.mesh import compile_synced

    # preemption-aware shutdown (beyond the reference, which dies
    # uncheckpointed on SIGTERM): multi-host uses JAX's preemption sync
    # manager — SIGTERM on ANY host makes reached_sync_point return True
    # on EVERY host at the same global step, so all hosts leave the
    # collective lockstep together; single-process installs a plain
    # SIGTERM flag. State is saved before exiting (partial epochs are
    # saved under their epoch number; resume redoes none, skips the
    # epoch's remaining batches). TPU.PREEMPTION_CHECKPOINT=0 disables.
    psm = None
    sigterm_flag = []
    if bool(cfg.get("TPU", {}).get("PREEMPTION_CHECKPOINT", True)):
        if multihost:
            from jax._src import distributed as _dist

            psm = _dist.global_state.preemption_sync_manager
            if psm is None:
                # process_count>1 without cli-driven
                # jax.distributed.initialize (e.g. runtime auto-init) or
                # with the preemption service disabled: a per-host
                # SIGTERM flag would desync the collective lockstep (the
                # signaled host exits, the others hang), so be loud
                # instead of silently unprotected
                logger.warning(
                    "TPU.PREEMPTION_CHECKPOINT: no preemption sync "
                    "manager on this multi-host runtime — SIGTERM will "
                    "NOT checkpoint; set TPU.MULTIHOST so cli/train "
                    "initializes jax.distributed itself")
        else:
            import signal

            def _on_sigterm(signum, frame):
                sigterm_flag.append(True)

            try:
                signal.signal(signal.SIGTERM, _on_sigterm)
            except ValueError:  # not the main thread (embedded use)
                pass

    def preempted(global_step: int) -> bool:
        if psm is not None:
            return bool(psm.reached_sync_point(global_step))
        return bool(sigterm_flag)

    step_exec = None
    val_fn = None
    val_exec = None
    global_step = 0
    stop = False
    for epoch in range(start_epoch, int(cfg.TRAIN.END_EPOCH)):
        loader = datamodule.train_dataloader(seed=epoch, shard=host_shard)
        term_dicts = []
        t0 = time.time()
        for batch in prefetch(loader, stage, depth=prefetch_depth):
            key, k = jax.random.split(key)
            if multihost and step_exec is None:
                step_exec = compile_synced(
                    step_fn, (params, opt_state, batch, k), "train_step")
            params, opt_state, loss, terms = (
                step_exec if step_exec is not None else step_fn)(
                params, opt_state, batch, k)
            term_dicts.append(terms)
            global_step += 1
            if preempted(global_step):
                logger.info(
                    f"preemption signal at epoch {epoch} step "
                    f"{global_step}: checkpointing and exiting")
                stop = True
                break
        epoch_metrics = aggregate(term_dicts, "train")
        mean_loss = epoch_metrics.get("total/train", float("nan"))
        logger.info(
            f"epoch {epoch}: loss={mean_loss:.4f} "
            f"({time.time() - t0:.1f}s, {len(term_dicts)} steps)")
        epoch_metrics["epoch_seconds"] = time.time() - t0

        # validation pass (reference VAL_EVERY_STEPS cadence); every loss
        # term is aggregated per split like the reference's Losses metric
        # collection (base.py:45-67)
        val_every = int(cfg.LOGGER.get("VAL_EVERY_STEPS", 0) or 0)
        if val_every and (epoch + 1) % val_every == 0 and not stop:
            if val_fn is None:
                val_fn = jax.jit(trainer.loss_fn())
            # multi-host: val batches must be host-sharded and assembled
            # into global arrays like train batches (full batches only —
            # a ragged global batch can't shard over the device mesh);
            # single-host keeps the replicated-batch val of the reference
            val_loader = datamodule.val_dataloader(
                shard=host_shard, drop_last=multihost)
            val_stage = stage if multihost else prepare
            val_terms = []
            for vbatch in prefetch(val_loader, val_stage,
                                   depth=prefetch_depth):
                key, k = jax.random.split(key)
                if multihost and val_exec is None:
                    val_exec = compile_synced(
                        val_fn, (params, vbatch, k), "val_step")
                _, vterms = (
                    val_exec if val_exec is not None else val_fn)(
                    params, vbatch, k)
                val_terms.append(vterms)
            val_metrics = aggregate(val_terms, "val")
            if val_metrics:
                logger.info(
                    f"epoch {epoch}: val loss="
                    f"{val_metrics.get('total/val', float('nan')):.4f}")
                epoch_metrics.update(val_metrics)
        if metrics is not None:
            metrics.log(epoch_metrics, step=epoch)
        progress.on_epoch_end(epoch, epoch_metrics)
        if is_main and ((epoch + 1) % save_every == 0 or
                        epoch == int(cfg.TRAIN.END_EPOCH) - 1 or stop):
            # process-0-only save of the replicated state: device_get on
            # multihost (params/opt_state are fully replicated over the
            # data mesh, so every host holds the complete value) avoids
            # orbax's coordinated all-host save and the shared-dir race
            tree = (jax.device_get((params, opt_state))
                    if multihost else (params, opt_state))
            # background write: the next epoch's compute overlaps host IO
            path = save_checkpoint(ckpt_dir, epoch, tree[0], tree[1],
                                   background=True)
            logger.info(f"saving {path} (async)")
        if stop:
            break
    wait_for_checkpoints()
    if metrics is not None:
        metrics.close()
    if multihost:
        # end-of-run sync BEFORE processes head into jax.distributed's
        # shutdown barrier: process 0 finishes checkpoint/metrics IO
        # long after the other hosts go idle, and on slow hosts that
        # skew can exceed the coordination service's shutdown deadline
        # (observed: "Shutdown barrier ... DEADLINE_EXCEEDED, 1/2 tasks"
        # on a 1-CPU runner). A cheap collective holds everyone here
        # until the slowest host is also done.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("convofusion_train_end")
    return params


if __name__ == "__main__":
    # main() returns its result object (params / the output dir) for
    # callers and tests — not an exit status
    main()
