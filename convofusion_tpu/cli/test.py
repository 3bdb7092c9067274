"""Test / generation entry point.

Reference: test.py (parse cfg phase=test -> datasets -> model -> load
TEST.CHECKPOINTS -> trainer.test dumping per-sample result dirs).

Run: python -m convofusion_tpu.cli.test --cfg <yaml> [key=value ...]
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from convofusion_tpu.cli.focus import select_focus_words
    from convofusion_tpu.config import ablation_flag, parse_args
    from convofusion_tpu.data.datamodule import get_datasets
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.models.results import (
        save_generation_results,
        save_vae_results,
    )
    from convofusion_tpu.models.tokenizer import focus_word_indices
    from convofusion_tpu.train.checkpoint import (
        load_checkpoint,
        load_torch_full_model,
    )
    from convofusion_tpu.utils.logger import create_logger

    cfg = parse_args("test", argv)
    from convofusion_tpu.utils.jaxsetup import setup_jax

    setup_jax(cfg)
    logger = create_logger(cfg, "test")
    datamodule = get_datasets(cfg, phase="test")[0]
    model = Convofusion(cfg)
    key = jax.random.PRNGKey(int(cfg.SEED_VALUE))
    key, k_init = jax.random.split(key)
    params = model.init_params(k_init)
    # orbax checkpoints strip the frozen T5 trunk (like the reference's
    # on_save_checkpoint, base.py:83-92); reinjection pulls from the
    # current tree, so load real t5-base weights from the asset drop
    # BEFORE the checkpoint load (utils/assets.py)
    from convofusion_tpu.train.checkpoint import maybe_load_t5_assets

    params = maybe_load_t5_assets(params)

    ckpt = str(cfg.TEST.CHECKPOINTS)
    if ckpt:
        if ckpt.endswith((".ckpt", ".pt", ".pth", ".bin")):
            params = load_torch_full_model(ckpt, params)
        else:
            params, _ = load_checkpoint(ckpt, params)
        logger.info(f"loaded checkpoint {ckpt}")

    # multi-host: the reference forces a single device for test
    # (config.py:92-95); under process_count > 1 we keep its semantics —
    # every host computes identical samples from the replicated params
    # (no collectives in the sampler), and ONLY process 0 writes result
    # artifacts, so N hosts sharing a results dir don't race
    is_main = jax.process_index() == 0

    out_dir = os.path.join(
        str(cfg.TEST.FOLDER), str(cfg.model.model_type), str(cfg.NAME),
        "samples_" + cfg.TIME)
    weg_type = ablation_flag(cfg, "WEG_TYPE")
    num_steps = int(cfg.model.scheduler.get("num_inference_timesteps",
                                            1000))
    capture = "all" if cfg.TEST.SAVE_PREDICTIONS else "none"

    # data-parallel inference over all local chips (batch sharded over
    # 'data', params replicated) when the batch divides the device count
    from convofusion_tpu.parallel.mesh import local_data_parallel

    data_sharding, params, n_dev = local_data_parallel(
        params, int(cfg.TEST.BATCH_SIZE))
    if data_sharding is not None:
        logger.info(f"data-parallel sampling over {n_dev} devices")

    # compiled-sampler + per-geometry uncond cache (shared helper,
    # models/convofusion.py:CachedSampler)
    sampler = model.cached_sampler(num_inference_steps=num_steps,
                                   capture_attention=capture)

    def sample_batch(arrays, k, focus):
        if data_sharding is not None and \
                arrays["lsn_ids"].shape[0] % n_dev == 0:
            # the final loader batch can be ragged — shard only when it
            # divides the mesh (params stay replicated either way)
            arrays = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, data_sharding), arrays)
        return sampler(params, arrays, k, focus=focus)

    loader = datamodule.test_dataloader()
    times = []
    timer = None
    if bool(cfg.TEST.get("COUNT_TIME", False)):
        from convofusion_tpu.utils.profiling import SampleTimer

        timer = SampleTimer(int(cfg.TEST.BATCH_SIZE), cfg.FOLDER_EXP,
                            log=logger.info)
    for batch in loader:
        if timer:
            timer.start()
        t0 = time.time()
        if cfg.TRAIN.STAGE == "vae":
            motion = jnp.asarray(batch["motion"])
            key, k = jax.random.split(key)
            latent, _, _ = model.vae_encode(params, motion, sample_key=k)
            recon = model.vae_decode(params, latent)
            if cfg.TEST.SAVE_PREDICTIONS and is_main:
                save_vae_results(out_dir, np.asarray(motion),
                                 np.asarray(recon), batch["length"],
                                 batch["name"])
            times.append(time.time() - t0)
            continue

        arrays, tb_spk, tb_lsn = _prepare(model, batch)
        focus = None
        focus_words = []
        if weg_type != "no":
            focus_words = select_focus_words(
                weg_type, batch["text_lsn"], batch.get("sem_info"))
            wrapped = model.tokenizer.wrapped_texts(batch["text_lsn"])
            word_maps_lsn = tb_lsn.word_map(wrapped)
            fi, fv = focus_word_indices(word_maps_lsn, focus_words)
            if fv.any():
                focus = {"focus_idx": fi, "focus_valid": fv}

        key, k = jax.random.split(key)
        motion, latents, att_seq = sample_batch(arrays, k, focus)
        motion.block_until_ready()
        times.append(time.time() - t0)
        if timer:
            timer.stop()
        logger.info(
            f"gen time: {times[-1]:.2f}s for {len(batch['length'])} "
            f"samples")

        if cfg.TEST.SAVE_PREDICTIONS and is_main:
            wrapped_lsn = model.tokenizer.wrapped_texts(batch["text_lsn"])
            wrapped_spk = model.tokenizer.wrapped_texts(batch["text_spk"])
            word_maps = {
                "lsn": tb_lsn.word_map(wrapped_lsn),
                "spk": tb_spk.word_map(wrapped_spk),
            }
            ts = model.scheduler.timesteps(num_steps)
            save_generation_results(
                out_dir,
                gt=batch["motion_lsn"], pred=np.asarray(motion),
                lengths=batch["length"], names=batch["name"],
                texts_lsn=batch["text_lsn"], texts_spk=batch["text_spk"],
                audios_lsn=batch.get("audio_lsn"),
                audios_spk=batch.get("audio_spk"),
                motion_spk=batch.get("motion_spk"),
                spk_names=batch.get("spk_name"),
                lsn_names=batch.get("lsn_name"),
                apb=batch.get("active_passive_lsn"),
                melspec_lsn=batch.get("melspec_lsn"),
                att_maps=att_seq, att_timesteps=ts,
                word_maps=word_maps, focus_words=focus_words,
                sem_lsn=batch.get("sem_lsn"),
                sem_info=batch.get("sem_info"),
            )
    if times:
        logger.info(
            f"mean time/batch: {np.mean(times):.2f}s over {len(times)}")
    if timer and is_main:
        timer.dump()
    if is_main:
        print(f"results saved to {out_dir}")
    if jax.process_count() > 1:
        # hold every host until process 0 finishes its writes, so a
        # caller seeing THIS process exit can rely on the artifacts.
        # A HOST barrier on the coordination service, NOT a device
        # collective: the generation loop above is collective-free and
        # per-host, so hosts arrive here whole batches apart — a
        # sync_global_devices would have to cold-initialize the gloo
        # context (CPU backend) inside its hard ~30 s rendezvous window
        # and dies on any real skew (measured: one 1-CPU batch is
        # 15-35 s).  The coordination client is already connected and
        # takes an explicit timeout sized to the workload.
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "convofusion_test_end", timeout_in_ms=1_800_000)
    return out_dir


def _prepare(model, batch):
    text_arrays, tb_spk, tb_lsn = model.prepare_text_batch(
        batch["text_spk"], batch["text_lsn"])
    arrays = {
        "melspec_lsn": jnp.asarray(batch["melspec_lsn"]),
        "active_passive_lsn": jnp.asarray(batch["active_passive_lsn"]),
        "lsn_id": jnp.asarray(batch["lsn_id"]),
        **text_arrays,
    }
    return arrays, tb_spk, tb_lsn


if __name__ == "__main__":
    # main() returns its result object (params / the output dir) for
    # callers and tests — not an exit status
    main()
