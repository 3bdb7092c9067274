"""Unbounded (long-form) synthesis: windowed rollout with latent inpainting.

Reference: unbounded_synthesis.py — per batch, iterate
``n_iters = 2*n_parts - 1`` half-overlapping 128-frame windows (:275-290);
per window slice every modality, re-derive text from word segments
(:189-241), run the guided sampler with the previous half-window's latents
inpainted at every step (:70-76), decode, and stitch root translation to
the previous window (:461-468).

TPU design: window slicing/text processing are host-side; the per-window
sampler is the same jitted scan as regular sampling (static shapes, so one
compile covers every window and both the preseq/no-preseq variants are two
compiles total).

Run: python -m convofusion_tpu.cli.unbounded --cfg <yaml> [key=value ...]
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

UNCOND = "-" * 10

# The reference rollout does NOT read cfg.model.weg_parameters —
# diffusion_reverse_forecast hardcodes its own WEG constants
# (unbounded_synthesis.py:83-88).  Unlike the regular sampler (where
# scale_range is initialized once outside the loop and the in-loop
# linspace reassignment collapses the decay, convofusion.py:395,436),
# the forecast re-initializes scale_range=(1., 0.5) INSIDE the step
# loop, so its step sizes follow the true linspace decay -> 'linspace'.
ROLLOUT_WEG_PARAMETERS = dict(
    scale_factor=100, scale_range=[1.0, 0.5],
    thresholds={0: 0.05, 200: 0.4, 400: 0.6, 600: 0.8},
    max_iter_to_alter=800, max_refinement_steps=300,
    scale_schedule="linspace")


def process_text(seg_batch, chunk_tstart: float, chunk_tend: float):
    """Window text from word segments (unbounded_synthesis.py:189-241):
    keep words fully inside the window plus the reference's overlap
    heuristics at the boundaries."""
    out = []
    chunk_len = chunk_tend - chunk_tstart
    mid = (chunk_tstart + chunk_tend) / 2
    for seg_lsn in seg_batch:
        if seg_lsn == UNCOND or seg_lsn is None:
            out.append(UNCOND if seg_lsn == UNCOND else "")
            continue
        words = []
        for s_idx, seg in enumerate(seg_lsn):
            s, e = float(seg[0][0]), float(seg[0][1])
            w = seg[1]
            if s >= chunk_tstart and e <= chunk_tend:
                words.append(w)
            elif (e >= mid and e <= chunk_tend
                  and ((s < (chunk_tstart - chunk_len / 2) and s_idx > 0)
                       or (s < chunk_tstart and s_idx == 0))):
                words.append(w)
            elif (s >= (chunk_tstart - 1) and s < chunk_tstart
                  and e <= (chunk_tend + 1) and e > chunk_tend):
                words.append(w)
            elif (s >= chunk_tstart and s <= mid
                  and e <= (chunk_tend + 1) and e >= chunk_tend):
                words.append(w)
            elif (s <= chunk_tstart and s >= (chunk_tstart - 1)
                  and e >= mid and e <= chunk_tend):
                words.append(w)
            elif s > mid and s <= (chunk_tend - 1) and e <= (chunk_tend + 1):
                words.append(w)
            elif (s >= (chunk_tstart - 1) and e >= (chunk_tstart + 2)
                  and e < mid):
                words.append(w)
        out.append(" ".join(words))
    return out


def rollout(model, params, batch, key, window_frames: int = 128,
            num_inference_steps=None, weg_type: str = "no",
            save_dir=None, verbose: bool = True, data_sharding=None):
    """Roll one long batch through half-overlapping windows.

    batch: the beatdnd_collate dict with long (B, n_parts*128, ...) arrays.
    ``data_sharding``: optional NamedSharding over the 'data' mesh axis —
    window arrays are placed on it (params must already be replicated by
    the caller), giving data-parallel long-form synthesis.
    Returns the stitched motion list [(B, 128, nfeats)] per window.
    """
    from convofusion_tpu.cli.focus import select_focus_words
    from convofusion_tpu.models.results import save_generation_results
    from convofusion_tpu.models.tokenizer import focus_word_indices

    # compiled-sampler + uncond cache shared across windows, rollout
    # calls and any other caller with the same settings; the WEG override
    # (ROLLOUT_WEG_PARAMETERS) is threaded statically so the model's
    # config-derived parameters are untouched
    sampler = model.cached_sampler(
        num_inference_steps=num_inference_steps,
        weg_params=ROLLOUT_WEG_PARAMETERS if weg_type != "no" else None)

    motion_len = window_frames
    fps = model.cfg.DATASET.BEATDND.FPS
    time_len = motion_len / fps
    total = batch["motion_lsn"].shape[1]
    n_parts = total // motion_len
    n_iters = 2 * n_parts - 1

    mel_total = batch["melspec_lsn"].shape[1]
    mel_len = mel_total // n_parts
    apb_len = batch["active_passive_lsn"].shape[1] // n_parts
    audio_len = batch["audio_lsn"].shape[1] // n_parts

    preseq = None
    prev = None
    outputs = []
    for chunk_idx in range(n_iters):
        t0 = time.time()
        t_start, t_end = (chunk_idx / 2) * time_len, \
            ((chunk_idx / 2) + 1) * time_len
        text_lsn = process_text(batch["seg_lsn"], t_start, t_end)
        text_spk = process_text(batch["seg_spk"], t_start, t_end)
        m0 = int((chunk_idx / 2) * motion_len)
        mel0 = int((chunk_idx / 2) * mel_len)
        apb0 = int((chunk_idx / 2) * apb_len)
        a0 = int((chunk_idx / 2) * audio_len)

        melspec_lsn = batch["melspec_lsn"][:, mel0:mel0 + mel_len + 1, :]
        apb = batch["active_passive_lsn"][:, apb0:apb0 + apb_len]

        text_arrays, tb_spk, tb_lsn = model.prepare_text_batch(
            text_spk, text_lsn)
        arrays = {
            "melspec_lsn": jnp.asarray(melspec_lsn),
            "active_passive_lsn": jnp.asarray(apb),
            "lsn_id": jnp.asarray(batch["lsn_id"]),
            **text_arrays,
        }
        if data_sharding is not None:
            arrays = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, data_sharding), arrays)

        # WEG focus words from the *non-overlapping* part of the window
        # (unbounded_synthesis.py:318-319)
        focus = None
        focus_words = []
        if weg_type != "no":
            if chunk_idx != 0:
                full_text = process_text(
                    batch["seg_lsn"], ((chunk_idx + 1) / 2) * time_len,
                    ((chunk_idx / 2) + 1) * time_len)
            else:
                full_text = text_lsn
            focus_words = select_focus_words(
                weg_type, full_text, batch.get("sem_info"))
            wrapped = model.tokenizer.wrapped_texts(text_lsn)
            fi, fv = focus_word_indices(tb_lsn.word_map(wrapped),
                                        focus_words)
            if fv.any():
                focus = {"focus_idx": fi, "focus_valid": fv}
                if data_sharding is not None:
                    focus = {k2: jax.device_put(jnp.asarray(v),
                                                data_sharding)
                             for k2, v in focus.items()}

        key, k = jax.random.split(key)
        motion, latents, att = sampler(params, arrays, k, focus=focus,
                                       preseq=preseq)

        # second half of the window's latent tokens feed the next window
        preseq = latents[:, latents.shape[1] // 2:, :]

        motion = np.array(motion)  # writable host copy
        if prev is not None:
            # root translation stitching (unbounded_synthesis.py:461-468)
            xz = np.array([1, 0, 1], np.float32)
            motion[:, :, :3] = motion[:, :, :3] - motion[:, :1, :3] * xz
            motion[:, :, :3] = motion[:, :, :3] + prev[:, :1, :3] * xz
        prev = motion[:, motion_len // 2:, :]
        outputs.append(motion)

        if verbose:
            print(f"window {chunk_idx + 1}/{n_iters}: "
                  f"{time.time() - t0:.2f}s")

        if save_dir is not None:
            names = [f"{n}+{chunk_idx}" for n in batch["name"]]
            gt = batch["motion_lsn"][:, m0:m0 + motion_len, :]
            save_generation_results(
                save_dir, gt=gt, pred=motion,
                lengths=[motion_len] * len(names), names=names,
                texts_lsn=text_lsn, texts_spk=batch["text_spk"],
                audios_lsn=batch["audio_lsn"][:, a0:a0 + audio_len],
                audios_spk=batch["audio_spk"][:, a0:a0 + audio_len],
                motion_spk=batch["motion_spk"][:, m0:m0 + motion_len, :],
                spk_names=batch.get("spk_name"),
                lsn_names=batch.get("lsn_name"),
                apb=np.asarray(apb), melspec_lsn=melspec_lsn,
                focus_words=focus_words,
            )
    return outputs


def main(argv=None):
    from convofusion_tpu.config import ablation_flag, parse_args
    from convofusion_tpu.data.datamodule import get_datasets
    from convofusion_tpu.models.convofusion import Convofusion
    from convofusion_tpu.train.checkpoint import (
        load_checkpoint,
        load_torch_full_model,
    )
    from convofusion_tpu.utils.logger import create_logger

    cfg = parse_args("test", argv)
    from convofusion_tpu.utils.jaxsetup import setup_jax

    setup_jax(cfg)
    # long-form clips: MAX_LEN covers the whole recording
    # (unbounded_synthesis.py:545-550 overrides MAX_LEN = 128*6)
    logger = create_logger(cfg, "unbounded")
    datamodule = get_datasets(cfg, phase="test")[0]
    model = Convofusion(cfg)
    # windows are always 128 frames regardless of the dataset MAX_LEN
    model.max_len = 128
    model.n_chunks = 8

    key = jax.random.PRNGKey(int(cfg.SEED_VALUE))
    key, k_init = jax.random.split(key)
    params = model.init_params(k_init)
    from convofusion_tpu.train.checkpoint import maybe_load_t5_assets

    params = maybe_load_t5_assets(params)  # asset drop (utils/assets.py)
    ckpt = str(cfg.TEST.CHECKPOINTS)
    if ckpt:
        if ckpt.endswith((".ckpt", ".pt", ".pth", ".bin")):
            params = load_torch_full_model(ckpt, params)
        else:
            params, _ = load_checkpoint(ckpt, params)
        logger.info(f"loaded checkpoint {ckpt}")

    out_dir = os.path.join(
        str(cfg.TEST.FOLDER), str(cfg.model.model_type), str(cfg.NAME),
        "unbounded_" + cfg.TIME)
    weg_type = ablation_flag(cfg, "WEG_TYPE")
    num_steps = int(cfg.model.scheduler.get("num_inference_timesteps",
                                            1000))

    # data-parallel rollout over all local chips when the batch divides
    # the device count (params replicated, windows sharded over 'data')
    from convofusion_tpu.parallel.mesh import local_data_parallel

    data_sharding, params, n_dev = local_data_parallel(
        params, int(cfg.TEST.BATCH_SIZE))
    if data_sharding is not None:
        logger.info(f"data-parallel rollout over {n_dev} devices")

    for batch in datamodule.test_dataloader():
        key, k = jax.random.split(key)
        sharding = (data_sharding if data_sharding is not None and
                    len(batch["name"]) % n_dev == 0 else None)
        rollout(model, params, batch, k,
                num_inference_steps=num_steps, weg_type=weg_type,
                save_dir=out_dir, data_sharding=sharding)
    print(f"results saved to {out_dir}")
    return out_dir


if __name__ == "__main__":
    # main() returns its result object (params / the output dir) for
    # callers and tests — not an exit status
    main()
