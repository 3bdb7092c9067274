"""Seeded-weights sampler-quality experiment (VERDICT r2 item 6).

Question: does DPM-Solver++ 2M at 15-20 steps hold the quality of the
DDIM-50 production sampler?  Protocol: with one seeded production-
geometry model and ONE shared init-noise/key, sample the same synthetic
condition batch with

    ddpm-1000   (the reference's training-time sampler — ground truth)
    ddim-50     (the production deployment mode, BASELINE.md)
    dpmpp_2m-20 / dpmpp_2m-15  (the fast deployment modes)

and report, per sampler vs the ddpm-1000 reference set:
  * frechet_feature_distance — Frechet distance between HalfEmbeddingNet
    feature sets (seeded random net weights: a fixed random projection
    of motion space; the released FID checkpoint is not in this image,
    so the number is a divergence proxy in a fixed feature basis, not
    the paper FID)
  * motion_rmse_vs_ddim50 — per-sample decoded-motion RMSE between the
    fast sampler and ddim-50 from the SAME init noise, normalized by the
    ddim-50 motion std (deterministic integrators; measures integrator
    truncation directly)

Run (TPU, ~2 min): python scripts/sampler_quality.py --batch 64
Results are recorded in docs/BENCHMARKS.md.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def trained_main(workdir, ckpt):
    """Trained-weights sampler-quality protocol (VERDICT r4 item 4).

    Uses the learning-loop overfit fixture + a TRAINED stage-2
    checkpoint (train/overfit.py) instead of seeded random weights, and
    answers the deployment question in sample space that now MEANS
    something: do the fast samplers reproduce the paired training
    motions as well as the ddim-50 production mode does?

    Per variant (ddim-50 / dpmpp_2m-20 / dpmpp_2m-15 / ddpm-1000), runs
    the REAL cli/test dump (guidance off: the conditional distribution
    itself) and reports reproduction_metrics vs the paired gt plus
    per-sample motion RMSE vs the ddim-50 dump (same seed => same init
    noise; deterministic integrators => direct truncation-error
    comparison).  Results in docs/BENCHMARKS.md "Fast-sampling".
    """
    import glob as _glob

    import numpy as np

    from convofusion_tpu.cli.test import main as test_main
    from convofusion_tpu.train.overfit import (
        reproduction_metrics,
        write_cfg,
    )

    beat = os.path.join(workdir, "beat")
    dnd = os.path.join(workdir, "dnd")
    assert os.path.isdir(beat) and os.path.isdir(ckpt), (beat, ckpt)

    def dump(variant, steps):
        cfgr, assetsr = write_cfg(
            workdir, beat, dnd, f"squal_{variant}_{steps}",
            stage="diffusion", epochs=1, batch=8, lr=1e-3, scale="small",
            infer_steps=steps,
            extra={"TEST": {"CHECKPOINTS": ckpt},
                   "model": {"guidance_scale": 1.0,
                             "scheduler": {
                                 "variant": variant,
                                 "num_inference_timesteps": steps}}})
        d = test_main(["--cfg", cfgr, "--cfg_assets", assetsr])
        dirs = sorted(p for p, _, fs in os.walk(d) if "pred.npy" in fs)
        preds = np.stack([np.load(os.path.join(p, "pred.npy"))
                          for p in dirs])
        return d, preds

    out = {}
    preds = {}
    for name, variant, steps in [
        ("ddim50", "ddim", 50),
        ("dpmpp20", "dpmpp_2m", 20),
        ("dpmpp15", "dpmpp_2m", 15),
        ("ddpm1000", "ddpm", 1000),
    ]:
        d, p = dump(variant, steps)
        preds[name] = p.astype(np.float64)
        out[name] = {"repro": reproduction_metrics(d)}
        print(f"# {name}: {out[name]['repro']}", file=sys.stderr)

    std50 = preds["ddim50"].std()
    for name in out:
        out[name]["motion_rmse_vs_ddim50_over_std"] = round(float(
            np.sqrt(((preds[name] - preds["ddim50"]) ** 2).mean())
            / std50), 4)
    print(json.dumps(out, indent=2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--trained-workdir", default=None,
                    help="learning-loop overfit workdir (fixture inside);"
                         " switches to the trained-weights protocol")
    ap.add_argument("--trained-ckpt", default=None,
                    help="trained stage-2 checkpoint dir (with "
                         "--trained-workdir)")
    args = ap.parse_args()

    if args.trained_workdir:
        import jax

        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        trained_main(args.trained_workdir, args.trained_ckpt)
        return

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
    from convofusion_tpu.eval.fid_net import HalfEmbeddingNet
    from convofusion_tpu.eval.metrics import frechet_distance
    from convofusion_tpu.models.convofusion import Convofusion

    def build(variant, steps):
        if args.tiny:
            cfg = tiny_config("diffusion")
        else:
            cfg = load_config(
                os.path.join(DEFAULTS_DIR, "config_cf_beatdnd.yaml"))
            cfg.DATASET.NFEATS = 189
            cfg.DATASET.NJOINTS = 63
            for blk in ("denoiser", "motion_vae", "text_encoder",
                        "audio_encoder"):
                cfg.model[blk].params["compute_dtype"] = args.dtype
        cfg.model.scheduler["variant"] = variant
        cfg.model.scheduler["num_inference_timesteps"] = steps
        return Convofusion(cfg)

    # one seeded weight set shared by every sampler variant
    base = build("ddim", 50)
    params = base.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, args.batch)
    arrays, _, _ = prepare_arrays(base, raw)
    arrays = jax.tree_util.tree_map(jnp.asarray, arrays)
    key = jax.random.PRNGKey(7)  # same init noise for all variants

    motions = {}
    for name, variant, steps in [
        ("ddpm1000", "ddpm", 1000),
        ("ddim50", "ddim", 50),
        ("dpmpp20", "dpmpp_2m", 20),
        ("dpmpp15", "dpmpp_2m", 15),
    ]:
        model = build(variant, steps)
        fn = jax.jit(lambda p, a, k, m=model: m.sample(p, a, k)[0])
        t0 = time.time()
        m = np.asarray(fn(params, arrays, key), np.float64)
        print(f"# {name}: {time.time() - t0:.1f}s "
              f"(incl. compile)", file=sys.stderr)
        assert np.isfinite(m).all(), name
        motions[name] = m

    net = HalfEmbeddingNet()
    net_params = net.init_params(seed=1)
    feats = {k: np.asarray(net(net_params, jnp.asarray(v, jnp.float32)),
                           np.float64)
             for k, v in motions.items()}

    std50 = motions["ddim50"].std()
    out = {}
    for name in ("ddim50", "dpmpp20", "dpmpp15"):
        fd = float(frechet_distance(feats[name], feats["ddpm1000"]))
        rmse = float(np.sqrt(
            ((motions[name] - motions["ddim50"]) ** 2).mean()) / std50)
        out[name] = {
            "frechet_feature_distance_vs_ddpm1000": round(fd, 4),
            "motion_rmse_vs_ddim50_over_std": round(rmse, 4),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
