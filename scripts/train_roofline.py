"""Diffusion-train-step roofline (VERDICT r3 item 3).

Decomposes the stage-2 train step — the cached production configuration
cli/train.py runs (frozen-T5 trunk activations + frozen-VAE posteriors as
batch inputs) — into timed, separately-jitted segments, and compares each
against its compute/bandwidth roofline from XLA cost_analysis:

    full        loss fwd + bwd + AdamW (bench.py --mode train parity)
    grad        loss fwd + bwd only
    fwd         loss fwd only
    opt         AdamW update alone (fixed grads)
    denoiser    denoiser fwd+bwd alone (conditions precomputed)
    cond        condition encoders fwd+bwd alone (trunk projection +
                audio encoder + fuser)

Timing: best-of-N with a forced host fetch as the barrier (over the axon
tunnel ``block_until_ready`` can return before execution completes —
docs/BENCHMARKS.md measurement note).

Run (v5e):  python scripts/train_roofline.py --batch 1024
Results + the floor argument live in docs/BENCHMARKS.md "Roofline".
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# v5e peaks (jax-ml.github.io/scaling-book): bf16 MXU, HBM bandwidth
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--uncached", action="store_true",
                    help="also time the uncached (in-step T5 trunk + VAE "
                         "encoder) step for the 38.7 GF/clip row")
    ap.add_argument("--segments", default="all",
                    help="comma list of segments to run "
                         "(full,fwd,grad,opt,denoiser,denoiser_fwd,cond)")
    ap.add_argument("--remat", action="store_true",
                    help="TPU.REMAT=true: per-layer gradient "
                         "rematerialization in the denoiser stack")
    args = ap.parse_args()
    want = (None if args.segments == "all"
            else set(args.segments.split(",")))

    def wanted(name):
        return want is None or name in want

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

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
    for blk in ("denoiser", "motion_vae", "text_encoder", "audio_encoder"):
        cfg.model[blk].params["compute_dtype"] = args.dtype
    if args.remat:
        cfg.TPU.REMAT = True  # base.yaml defines the TPU block

    model = Convofusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    raw = synthetic_raw_batch(0, args.batch)
    batch, _, _ = prepare_arrays(model, raw)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    # cached-production batch layout (cli/train.py steady state)
    trunk = jax.jit(model.encode_text_trunk)
    cached = dict(batch)
    cached["spk_trunk"] = trunk(params, batch["spk_ids"],
                                batch["spk_tmask"])
    cached["lsn_trunk"] = trunk(params, batch["lsn_ids"],
                                batch["lsn_tmask"])
    cached["uncond_trunk"] = trunk(params, batch["uncond_ids"][:1],
                                   batch["uncond_tmask"][:1])
    cached["uncond_tmask"] = batch["uncond_tmask"][:1]
    for k in ("spk_ids", "lsn_ids", "uncond_ids"):
        del cached[k]
    mu, lv = jax.jit(model.encode_vae_posterior)(
        params, cached["motion_lsn"])
    cached["vae_mu"], cached["vae_logvar"] = mu, lv
    del cached["motion_lsn"]
    jax.block_until_ready(cached["vae_mu"])

    # the PRODUCTION optimizer (cli/train parity): frozen subtrees (T5
    # trunk, stage-2 VAE) masked out of AdamW — no moments, no decay, no
    # HBM traffic for ~80% of the param count (train/trainer.py)
    from convofusion_tpu.train.trainer import make_optimizer

    cfg.TRAIN.OPTIM.LR = 7e-5
    opt = make_optimizer(cfg, stage="diffusion")
    opt_state = opt.init(params)
    loss_fn = model.train_diffusion_loss
    key = jax.random.PRNGKey(1)

    results = {}

    def timed(name, fn, *fn_args, donate=(), chain=1):
        jitted = jax.jit(fn, donate_argnums=donate)
        # cost analysis BEFORE execution (donation invalidates buffers)
        flops = bytes_ = None
        try:
            ca = jitted.lower(*fn_args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
            bytes_ = float(ca.get("bytes accessed", 0.0)) or None
        except Exception:
            pass

        def refresh(args_now, out):
            # donated functions return outputs aligned with their donated
            # arg slots — thread them back so buffers stay alive
            return tuple(out[j] if j in donate else args_now[j]
                         for j in range(len(args_now)))

        # compile + warmup
        t0 = time.time()
        out = jitted(*fn_args)
        first = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(first.ravel()[:1]))
        compile_s = time.time() - t0
        args_now = refresh(fn_args, out) if donate else fn_args
        times = []
        for i in range(args.iters):
            t0 = time.time()
            # `chain` back-to-back dispatches per fetch barrier: the
            # forced host fetch rides the axon tunnel (~tens of ms
            # round-trip), which swamps sub-50 ms segments if paid per
            # step — amortize it, then divide out
            for _ in range(chain):
                out = jitted(*args_now)
                if donate:
                    args_now = refresh(args_now, out)
            first = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(first.ravel()[:1]))
            times.append((time.time() - t0) / chain)
        best = min(times)
        row = {"ms": round(best * 1e3, 1),
               "compile_s": round(compile_s, 1)}
        if chain > 1:
            row["chain"] = chain
        if flops:
            row["tflops"] = round(flops / 1e12, 2)
            row["flops_floor_ms"] = round(flops / PEAK_FLOPS * 1e3, 1)
            row["mfu_pct"] = round(flops / best / PEAK_FLOPS * 100, 1)
        if bytes_:
            row["hbm_gb"] = round(bytes_ / 1e9, 2)
            row["bytes_floor_ms"] = round(bytes_ / PEAK_BYTES * 1e3, 1)
        results[name] = row
        print(f"# {name:10s} {json.dumps(row)}", file=sys.stderr)
        return out

    # ---- tunnel/dispatch constant: a trivial op under the same barrier
    # (subtract this from sub-50 ms segments when reading the table) ----
    if wanted("null"):
        timed("null", lambda x: x + 1.0, jnp.ones((8,), jnp.float32))

    # ---- full step (donated, bench.py parity) ----
    def full_step(p, o, b, k):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b, k)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o

    if wanted("full"):
        p2, o2 = timed("full", full_step, params, opt_state, cached, key,
                       donate=(0, 1))
        del p2, o2
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = opt.init(params)

    # ---- fwd only / fwd+bwd ----
    if wanted("fwd"):
        timed("fwd", lambda p, b, k: loss_fn(p, b, k)[0],
              params, cached, key)
    if wanted("grad") or wanted("opt"):
        grads = timed(
            "grad", lambda p, b, k: jax.value_and_grad(
                loss_fn, has_aux=True)(p, b, k)[1],
            params, cached, key)

    # ---- optimizer alone (outputs aligned with donated arg slots) ----
    if wanted("opt"):
        def opt_only(p, o, g):
            updates, o = opt.update(g, o, p)
            return optax.apply_updates(p, updates), o

        timed("opt", opt_only, params, opt_state, grads, donate=(0, 1),
              chain=8)
        params = model.init_params(jax.random.PRNGKey(0))
        opt_state = opt.init(params)

    # ---- denoiser fwd+bwd alone (conditions precomputed outside) ----
    if not (wanted("denoiser") or wanted("denoiser_fwd")
            or wanted("cond")):
        if args.uncached and wanted("full_uncached"):
            timed("full_uncached", full_step, params, opt_state, batch,
                  key, donate=(0, 1))
        per_clip = {k: round(v["ms"] / args.batch * 1e3, 1)
                    for k, v in results.items()}
        print(json.dumps({"batch": args.batch, "dtype": args.dtype,
                          "segments": results, "us_per_clip": per_clip}))
        return
    k_enc, k_drop, k_noise, k_t, k_do = jax.random.split(key, 5)
    dropped = jax.jit(model.apply_modality_dropout)(k_drop, cached)
    cond, masks = jax.jit(partial(
        model.encode_conditions_precomputed, deterministic=True))(
        params, dropped["spk_trunk"], dropped["spk_tmask"],
        dropped["lsn_trunk"], dropped["lsn_tmask"],
        dropped["melspec_lsn"], dropped["active_passive_lsn"],
        dropped["lsn_id"])
    jax.block_until_ready(cond)
    b = args.batch
    z = jnp.transpose(cached["vae_mu"], (1, 0, 2, 3))
    z = jnp.transpose(z, (1, 2, 0, 3)).reshape(
        b, 2 * model.n_chunks, model.latent_dim)
    noise = jax.random.normal(k_noise, z.shape, z.dtype)
    ts = jax.random.randint(
        k_t, (b,), 0, model.noise_scheduler.num_train_timesteps)
    noisy = model.noise_scheduler.add_noise(z, noise, ts)

    def denoiser_loss(p, noisy_, ts_, cond_, masks_, noise_):
        pred, _ = model.denoiser.apply(
            {"params": p["denoiser"]}, noisy_, ts_, cond_, masks_,
            deterministic=True)
        return ((pred - noise_) ** 2).mean()

    # batch tensors must be jit ARGUMENTS: closure-captured arrays become
    # HLO literals and the axon remote-compile proxy rejects the payload
    if wanted("denoiser"):
        timed("denoiser",
              lambda p, a, b_, c, d, e: jax.grad(denoiser_loss)(
                  p, a, b_, c, d, e),
              params, noisy, ts, cond, masks, noise)

    if wanted("denoiser_fwd"):
        def denoiser_fwd(p, noisy_, ts_, cond_, masks_):
            pred, _ = model.denoiser.apply(
                {"params": p["denoiser"]}, noisy_, ts_, cond_, masks_,
                deterministic=True)
            return pred

        timed("denoiser_fwd", denoiser_fwd, params, noisy, ts, cond,
              masks)

    # ---- condition encoders fwd+bwd alone ----
    if wanted("cond"):
        def cond_loss(p, d):
            c, _ = model.encode_conditions_precomputed(
                p, d["spk_trunk"], d["spk_tmask"], d["lsn_trunk"],
                d["lsn_tmask"], d["melspec_lsn"],
                d["active_passive_lsn"], d["lsn_id"])
            return sum(jnp.sum(v ** 2) for v in c.values())

        timed("cond", lambda p, d: jax.grad(cond_loss)(p, d), params,
              dropped, chain=8)

    if args.uncached and wanted("full_uncached"):
        timed("full_uncached", full_step, params, opt_state, batch, key,
              donate=(0, 1))

    per_clip = {k: round(v["ms"] / args.batch * 1e3, 1)
                for k, v in results.items()}
    print(json.dumps({"batch": args.batch, "dtype": args.dtype,
                      "segments": results, "us_per_clip": per_clip}))


if __name__ == "__main__":
    main()
