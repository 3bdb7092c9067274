"""Headline benchmark: gesture clips/sec/chip at 50 DDIM steps.

Target (BASELINE.md): >= 50 clips/sec/chip on TPU v5e with the production
model topology (latent [1,128], 9-layer 512-dim denoiser, 5-layer VAE,
t5-base text encoder, 7-way modality guidance).

Measures the full generation path the reference times in test_step
(convofusion.py:263-282): condition encoding (T5 x2 + audio enc + fuser),
50 reverse-diffusion steps with the 7-branch guidance batch, and VAE
decode to (B, 128, 189) motion.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for local smoke)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims for a fast smoke run")
    ap.add_argument("--fused", action="store_true",
                    help="use the padded fused 5-stream layout instead of "
                         "the (faster) guidance-aware grouped path")
    ap.add_argument("--mode", default="sample",
                    choices=["sample", "train"],
                    help="sample = generation clips/s (headline); "
                         "train = diffusion-stage training clips/s")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from convofusion_tpu.config import DEFAULTS_DIR, load_config
    from convofusion_tpu.config.testing import tiny_config
    from convofusion_tpu.data.synthetic import (
        prepare_arrays,
        synthetic_raw_batch,
    )
    from convofusion_tpu.models.convofusion import Convofusion

    if args.tiny:
        cfg = tiny_config("diffusion")
    else:
        cfg = load_config(
            os.path.join(DEFAULTS_DIR, "config_cf_beatdnd.yaml"))
        cfg.DATASET.NFEATS = 189
        cfg.DATASET.NJOINTS = 63
    cfg.model.scheduler["variant"] = "ddim"
    cfg.model.scheduler["num_inference_timesteps"] = args.steps
    for block in ("denoiser", "motion_vae", "text_encoder", "audio_encoder"):
        cfg.model[block].params["compute_dtype"] = args.dtype
    cfg.model.denoiser.params["fuse_streams"] = args.fused

    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, args.batch)
    batch, _, _ = prepare_arrays(model, raw)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    if args.mode == "train":
        import optax

        opt = optax.adamw(7e-5)
        opt_state = opt.init(params)

        @jax.jit
        def train_step(p, o, k):
            (loss, _), grads = jax.value_and_grad(
                model.train_diffusion_loss, has_aux=True)(p, batch, k)
            updates, o = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        t0 = time.time()
        params, opt_state, loss = train_step(params, opt_state,
                                             jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
        compile_s = time.time() - t0
        times = []
        for i in range(max(args.iters, 10)):
            t0 = time.time()
            params, opt_state, loss = train_step(
                params, opt_state, jax.random.PRNGKey(2 + i))
            jax.block_until_ready(loss)
            times.append(time.time() - t0)
        best = min(times)
        clips_per_sec = args.batch / best
        result = {
            "metric": "train_clips_per_sec",
            "value": round(clips_per_sec, 2),
            "unit": "clips/s/chip",
            "vs_baseline": round(clips_per_sec / 50.0, 3),
        }
        print(json.dumps(result))
        print(f"# TRAIN batch={args.batch} dtype={args.dtype} "
              f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms "
              f"loss={float(loss):.4f}", file=sys.stderr)
        return

    sample = jax.jit(
        lambda p, b, k: model.sample(p, b, k)[0])

    # compile + warmup
    t0 = time.time()
    motion = sample(params, batch, jax.random.PRNGKey(1))
    motion.block_until_ready()
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(motion[:2])).all(), "non-finite output"

    times = []
    for i in range(args.iters):
        t0 = time.time()
        motion = sample(params, batch, jax.random.PRNGKey(2 + i))
        motion.block_until_ready()
        times.append(time.time() - t0)

    best = min(times)
    clips_per_sec = args.batch / best
    n_dev = jax.local_device_count()
    result = {
        "metric": f"clips_per_sec_{args.steps}step_ddim",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 50.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# batch={args.batch} steps={args.steps} dtype={args.dtype} "
        f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms "
        f"mean={sum(times) / len(times) * 1e3:.1f}ms devices={n_dev} "
        f"platform={jax.devices()[0].platform}",
        file=sys.stderr)


if __name__ == "__main__":
    main()
