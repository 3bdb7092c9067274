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
from functools import partial

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
                    choices=["sample", "train", "rollout", "serve"],
                    help="sample = generation clips/s (headline); "
                         "train = diffusion-stage training clips/s; "
                         "rollout = long-form windowed synthesis with "
                         "latent inpainting (windows/s); "
                         "serve = online micro-batching service "
                         "(convofusion_tpu/serving.py) under closed-loop "
                         "client load — clips/s + latency percentiles")
    ap.add_argument("--parts", type=int, default=3,
                    help="rollout mode: 128-frame parts per long clip "
                         "(2*parts-1 half-overlapping windows)")
    ap.add_argument("--weg", action="store_true",
                    help="sample mode: enable word-excitation guidance "
                         "(2 focus words/sample, config thresholds) to "
                         "measure the WEG sampling mode's cost")
    ap.add_argument("--serve-wait-ms", type=float, default=25.0,
                    help="serve mode: micro-batching delay bound "
                         "(GestureService max_wait_ms)")
    ap.add_argument("--serve-requests", type=int, default=0,
                    help="serve mode: total timed requests "
                         "(0 = 20 x batch)")
    ap.add_argument("--serve-clients", type=int, default=0,
                    help="serve mode: concurrent closed-loop clients "
                         "(0 = 2 x batch)")
    ap.add_argument("--stage", default="diffusion",
                    choices=["diffusion", "vae"],
                    help="train mode: which training stage to time "
                         "(vae = stage-1 config_vae_beatdnd.yaml, "
                         "BASELINE milestone #1/#3)")
    ap.add_argument("--cached-text", action="store_true",
                    help="train mode: precompute the frozen T5 trunk "
                         "activations (cli/train.py's "
                         "TPU.CACHE_TEXT_TRUNK steady state) and time "
                         "the cached-trunk step")
    ap.add_argument("--cached-vae", action="store_true",
                    help="train mode: precompute the frozen VAE "
                         "posterior (cli/train.py's "
                         "TPU.CACHE_VAE_POSTERIOR steady state; the "
                         "reparameterization noise stays in-step)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the batch over an N-device 'data' mesh "
                         "(params replicated); 0 = single device. "
                         "Reports per-chip throughput.")
    ap.add_argument("--host-devices", type=int, default=0,
                    help="with --platform cpu: number of virtual host "
                         "devices to create (for mesh smoke runs)")
    ap.add_argument("--mfu", action="store_true",
                    help="also report FLOPs/clip and MFU from XLA "
                         "cost_analysis (stderr)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="sampler scan unroll factor (TPU.SCAN_UNROLL)")
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "ddpm", "dpmpp_2m"],
                    help="reverse-process variant (dpmpp_2m = fast "
                         "deployment mode; pair with --steps 15-20)")
    ap.add_argument("--tokenizer", default="auto",
                    choices=["auto", "synthetic", "hash"],
                    help="text tokenizer for the bench path: auto = real "
                         "spiece.model if present, else a synthetic "
                         "t5-geometry spiece (exercises the production "
                         "SentencePiece pipeline; ids not t5-base); hash "
                         "= the WordHashTokenizer fallback")
    ap.add_argument("--chain", type=int, default=1,
                    help="sample/train modes: back-to-back dispatches per "
                         "timing fetch. The production loops are async "
                         "(cli/train fetches metrics at epoch end; serving "
                         "pipelines fetch a batch behind), so chained "
                         "timing amortizes the ~29 ms axon-tunnel fetch "
                         "round-trip that per-step fetching pays; 1 = the "
                         "conservative per-step-fetch protocol")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of one timed "
                         "iteration into DIR (NB: hangs on tunneled "
                         "TPU backends; use on directly attached "
                         "devices or --platform cpu)")
    args = ap.parse_args()

    if args.host_devices:
        from convofusion_tpu.utils.hostenv import set_host_device_count

        set_host_device_count(args.host_devices)

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

    vae_stage = args.mode == "train" and args.stage == "vae"
    if args.tiny:
        cfg = tiny_config("vae" if vae_stage else "diffusion")
    else:
        cfg = load_config(os.path.join(
            DEFAULTS_DIR,
            "config_vae_beatdnd.yaml" if vae_stage
            else "config_cf_beatdnd.yaml"))
        cfg.DATASET.NFEATS = 189
        cfg.DATASET.NJOINTS = 63
    cfg.model.scheduler["variant"] = args.sampler
    cfg.model.scheduler["num_inference_timesteps"] = args.steps
    for block in ("denoiser", "motion_vae", "text_encoder", "audio_encoder"):
        cfg.model[block].params["compute_dtype"] = args.dtype
    cfg.model.denoiser.params["fuse_streams"] = args.fused
    cfg.TPU["SCAN_UNROLL"] = args.unroll

    tokenizer = None
    # --tiny defaults to the hash tokenizer for speed, but honor an
    # EXPLICIT --tokenizer synthetic request even in a tiny smoke run
    want_spiece = (args.tokenizer == "synthetic"
                   or (not args.tiny and args.tokenizer != "hash"))
    if want_spiece:
        # run the PRODUCTION tokenizer pipeline (native proto parse ->
        # tokenizers Unigram Viterbi -> subword word maps) even without
        # the real t5-base asset: synthesize a t5-geometry spiece.model
        # (models/sentencepiece.py).  Only ids differ from t5-base.
        from convofusion_tpu.models.tokenizer import (
            SentencePieceTokenizer,
            find_spiece,
        )

        spiece = None if args.tokenizer == "synthetic" else \
            find_spiece("t5-base")
        which = "t5-base spiece.model"
        if spiece is None:
            from convofusion_tpu.models.sentencepiece import (
                write_synthetic_spiece,
            )

            spiece = write_synthetic_spiece(os.path.join(
                os.path.expanduser("~"), ".cache", "convofusion_tpu",
                "synthetic_spiece.model"))
            which = ("synthetic t5-geometry spiece (production "
                     "SentencePiece pipeline; ids not t5-base)")
        tokenizer = SentencePieceTokenizer(spiece, max_length=200)
        print(f"# tokenizer: {which}", file=sys.stderr)
        # the embedding table must cover the tokenizer's id space — the
        # tiny config's 1000-row table under 32k spiece ids would gather
        # out of range (observed: non-finite motion output)
        need = int(tokenizer.vocab_size)
        if int(cfg.model.text_encoder.params.get("vocab_size", 0)) < need:
            cfg.model.text_encoder.params["vocab_size"] = need

    model = Convofusion(cfg, tokenizer=tokenizer)
    params = model.init_params(jax.random.PRNGKey(0))

    if args.mode == "rollout":
        # long-form synthesis: 2*parts-1 half-overlapping 128-frame
        # windows, previous half-window latents inpainted every step
        # (cli/unbounded.rollout; reference unbounded_synthesis.py)
        from convofusion_tpu.cli.unbounded import rollout
        from convofusion_tpu.data.synthetic import synthetic_long_batch

        if args.mfu:
            print("# --mfu applies to sample/train modes only (the "
                  "rollout re-enters cached executables); ignoring.",
                  file=sys.stderr)
        n_chips_r, data_sharding = 1, None
        if args.mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from convofusion_tpu.parallel.mesh import create_mesh

            n_chips_r = args.mesh
            assert len(jax.devices()) >= n_chips_r, (
                f"--mesh {n_chips_r} requested but only "
                f"{len(jax.devices())} devices available (use "
                "--host-devices for a virtual CPU mesh)")
            assert args.batch % n_chips_r == 0, "batch must divide mesh"
            mesh = create_mesh(n_data=n_chips_r, n_model=1,
                               devices=jax.devices()[:n_chips_r])
            data_sharding = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, NamedSharding(mesh, P()))
        long_batch = synthetic_long_batch(0, args.batch,
                                          n_parts=args.parts)
        n_windows = 2 * args.parts - 1

        # --weg: the reference rollout runs word-excitation guidance by
        # default (unbounded_synthesis.py:322-360); 'random' selection
        # works on synthetic text
        r_weg = "random" if args.weg else "no"
        t0 = time.time()
        outs = rollout(model, params, long_batch, jax.random.PRNGKey(1),
                       num_inference_steps=args.steps, verbose=False,
                       data_sharding=data_sharding, weg_type=r_weg)
        compile_s = time.time() - t0
        assert len(outs) == n_windows
        import numpy as np

        assert all(np.isfinite(o).all() for o in outs), "non-finite output"

        times = []
        for i in range(args.iters):
            t0 = time.time()
            rollout(model, params, long_batch, jax.random.PRNGKey(2 + i),
                    num_inference_steps=args.steps, verbose=False,
                    data_sharding=data_sharding, weg_type=r_weg)
            times.append(time.time() - t0)
        best = min(times)
        spread_pct = (max(times) - best) / best * 100
        windows_per_sec = args.batch * n_windows / best / n_chips_r
        result = {
            "metric": f"rollout_windows_per_sec_{args.steps}step"
                      + ("_weg" if args.weg else ""),
            "value": round(windows_per_sec, 2),
            "unit": "windows/s/chip",
            "vs_baseline": round(windows_per_sec / 50.0, 3),
        }
        print(json.dumps(result))
        print(f"# ROLLOUT batch={args.batch} parts={args.parts} "
              f"windows={n_windows} steps={args.steps} "
              f"dtype={args.dtype} compile={compile_s:.1f}s "
              f"best={best * 1e3:.1f}ms "
              f"({best / n_windows * 1e3:.1f}ms/window) "
              f"spread={spread_pct:.1f}% mesh={n_chips_r} "
              f"platform={jax.devices()[0].platform}", file=sys.stderr)
        return

    if args.mode == "serve":
        # online serving: single requests -> fixed-geometry micro-batches
        # over the compiled sampler (convofusion_tpu/serving.py).  The
        # number that matters for deployment: service-level clips/s and
        # the request latency distribution under closed-loop load.
        import threading

        import numpy as np

        from convofusion_tpu.serving import GestureRequest, GestureService

        svc = GestureService(model, params, batch_size=args.batch,
                             max_wait_ms=args.serve_wait_ms,
                             num_inference_steps=args.steps, weg=args.weg)

        def make_req(i):
            r = np.random.default_rng(i)
            return GestureRequest(
                text_lsn=f"synthetic listener line {i % 97} about gestures",
                text_spk=f"synthetic speaker line {i % 89} about motion",
                melspec=r.uniform(-80.0, 0.0, (161, 80)).astype(np.float32),
                active_passive=r.integers(0, 3, 8).astype(np.int32),
                lsn_id=int(r.integers(1, 36)),
                focus_words=("gestures",) if args.weg else (),
            )

        # compile + warmup: one full batch
        t0 = time.time()
        for f in [svc.submit(make_req(i)) for i in range(args.batch)]:
            f.result(timeout=3600)
        compile_s = time.time() - t0

        # unloaded latency: lone requests (tail-padded to the full
        # geometry), each paying max_wait + one batch
        solo = []
        for i in range(5):
            t0 = time.time()
            svc.generate(make_req(10_000 + i), timeout=3600)
            solo.append(time.time() - t0)

        # loaded throughput: closed-loop clients, enough to keep every
        # micro-batch full
        total = args.serve_requests or 20 * args.batch
        n_clients = args.serve_clients or 2 * args.batch
        counter = {"n": 0}
        lock = threading.Lock()

        def client(cid):
            while True:
                with lock:
                    if counter["n"] >= total:
                        return
                    counter["n"] += 1
                    i = counter["n"]
                svc.generate(make_req(cid * 100_003 + i), timeout=3600)

        svc.reset_stats()
        t0 = time.time()
        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        st = svc.stats()
        svc.close()

        clips_per_sec = st["requests"] / wall
        result = {
            "metric": f"serve_clips_per_sec_{args.steps}step"
                      + ("_weg" if args.weg else ""),
            "value": round(clips_per_sec, 2),
            "unit": "clips/s/chip",
            "vs_baseline": round(clips_per_sec / 50.0, 3),
        }
        print(json.dumps(result))
        print(f"# SERVE batch={args.batch} wait={args.serve_wait_ms}ms "
              f"clients={n_clients} requests={st['requests']} "
              f"batches={st['batches']} "
              f"occupancy={st['occupancy']:.3f} compile={compile_s:.1f}s "
              f"solo_latency={min(solo) * 1e3:.0f}ms "
              f"loaded_p50={st['latency_p50_ms']:.0f}ms "
              f"loaded_p95={st['latency_p95_ms']:.0f}ms "
              f"platform={jax.devices()[0].platform}", file=sys.stderr)
        return

    raw = synthetic_raw_batch(0, args.batch)
    if vae_stage:
        # stage-1 batch is motion only (beatdnd_vae_collate semantics)
        batch = {"motion": jnp.asarray(raw["motion_lsn"])}
    else:
        batch, _, _ = prepare_arrays(model, raw)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)

    n_chips = 1
    if args.mesh:
        # production data sharding: batch over 'data', params replicated,
        # XLA inserts the collectives (tests/test_multidevice.py wiring)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from convofusion_tpu.parallel.mesh import create_mesh

        n_chips = args.mesh
        assert len(jax.devices()) >= n_chips, (
            f"--mesh {n_chips} requested but only {len(jax.devices())} "
            "devices available (use --host-devices for a virtual CPU mesh)")
        assert args.batch % n_chips == 0, "batch must divide the mesh"
        mesh = create_mesh(n_data=n_chips, n_model=1,
                           devices=jax.devices()[:n_chips])
        data = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, data), batch)
        params = jax.device_put(params, rep)

    if args.mode == "train":
        import optax

        if args.cached_text and vae_stage:
            print("# --cached-text is diffusion-stage only; ignoring.",
                  file=sys.stderr)
            args.cached_text = False
        if args.cached_text:
            # steady state of cli/train.py's frozen-trunk cache: trunk
            # activations are batch inputs (ids are not shipped at all;
            # the uncond row stays a single broadcastable entry)
            trunk = jax.jit(model.encode_text_trunk)
            batch = dict(batch)
            batch["spk_trunk"] = trunk(params, batch["spk_ids"],
                                       batch["spk_tmask"])
            batch["lsn_trunk"] = trunk(params, batch["lsn_ids"],
                                       batch["lsn_tmask"])
            batch["uncond_trunk"] = trunk(params, batch["uncond_ids"][:1],
                                          batch["uncond_tmask"][:1])
            batch["uncond_tmask"] = batch["uncond_tmask"][:1]
            jax.block_until_ready(batch["uncond_trunk"])
            for k in ("spk_ids", "lsn_ids", "uncond_ids"):
                del batch[k]
        if args.cached_vae and vae_stage:
            print("# --cached-vae is diffusion-stage only; ignoring.",
                  file=sys.stderr)
            args.cached_vae = False
        if args.cached_vae:
            # steady state of cli/train.py's frozen-VAE posterior cache:
            # (mu, logvar) are batch inputs, the in-step encoder is gone
            batch = dict(batch)
            mu, lv = jax.jit(model.encode_vae_posterior)(
                params, batch["motion_lsn"])
            batch["vae_mu"], batch["vae_logvar"] = mu, lv
            jax.block_until_ready(mu)
            del batch["motion_lsn"]

        # the PRODUCTION optimizer (cli/train parity): frozen subtrees —
        # the T5 trunk, and the VAE in the diffusion stage — are masked
        # out of AdamW entirely (train/trainer.py::make_optimizer), which
        # also removes their moment buffers from the step's HBM traffic
        from convofusion_tpu.train.trainer import make_optimizer

        cfg.TRAIN.OPTIM.LR = 7e-5
        opt = make_optimizer(cfg, stage=("vae" if vae_stage
                                         else "diffusion"))
        opt_state = opt.init(params)

        # donate params/opt-state like train/trainer.py's step — without
        # donation XLA must double-buffer both trees
        loss_fn = (model.train_vae_loss if vae_stage
                   else model.train_diffusion_loss)

        # batch is an ARGUMENT, not a closure: closed-over arrays become
        # HLO literals, which bloats the compile payload by the batch
        # size (the axon remote-compile proxy rejects >~100 MB bodies)
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(p, o, b, k):
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, b, k)
            updates, o = opt.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        # force a host fetch of the loss as the timing barrier: over the
        # axon tunnel block_until_ready can return before device
        # execution completes (docs/BENCHMARKS.md measurement note)
        t0 = time.time()
        params, opt_state, loss = train_step(params, opt_state, batch,
                                             jax.random.PRNGKey(1))
        float(loss)
        compile_s = time.time() - t0
        times = []
        keys = [jax.random.PRNGKey(2 + i)
                for i in range(max(args.iters, 10) * args.chain)]
        ki = iter(keys)
        for i in range(max(args.iters, 10)):
            t0 = time.time()
            for _ in range(args.chain):
                params, opt_state, loss = train_step(
                    params, opt_state, batch, next(ki))
            float(loss)
            times.append((time.time() - t0) / args.chain)
        best = min(times)
        clips_per_sec = args.batch / best / n_chips
        result = {
            "metric": ("train_vae_clips_per_sec" if vae_stage
                       else "train_clips_per_sec"),
            "value": round(clips_per_sec, 2),
            "unit": "clips/s/chip",
            "vs_baseline": round(clips_per_sec / 50.0, 3),
        }
        print(json.dumps(result))
        print(f"# TRAIN stage={args.stage} "
              f"batch={args.batch} dtype={args.dtype} "
              f"cached_text={args.cached_text} "
              f"cached_vae={args.cached_vae} chain={args.chain} "
              f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms "
              f"spread={(max(times) - best) / best * 100:.1f}% "
              f"loss={float(loss):.4f}", file=sys.stderr)
        if args.mfu and n_chips > 1:
            print("# --mfu is single-chip-only (see sample mode note).",
                  file=sys.stderr)
        elif args.mfu:
            # no scan in the train step, so whole-jit cost_analysis is
            # the true per-step FLOP count (fwd + bwd + AdamW)
            flops = _xla_flops(
                train_step, (params, opt_state, jax.random.PRNGKey(1)))
            if flops:
                report_mfu(flops, args.batch, best, n_chips,
                           jax.devices()[0].platform, args.dtype,
                           note="train fwd+bwd+adamw")
        return

    focus = None
    if args.weg:
        # two in-vocab focus words per sample (cli/focus.py semantics);
        # the WEG refinement loop + per-step text-only grad pass run
        # inside the same compiled scan
        focus = {
            "focus_idx": jnp.tile(jnp.asarray([[2, 3]], jnp.int32),
                                  (args.batch, 1)),
            "focus_valid": jnp.ones((args.batch, 2), jnp.float32),
        }

    sample = jax.jit(
        lambda p, b, k: model.sample(p, b, k, focus=focus)[0])

    # compile + warmup
    t0 = time.time()
    motion = sample(params, batch, jax.random.PRNGKey(1))
    motion.block_until_ready()
    compile_s = time.time() - t0
    assert np.isfinite(np.asarray(motion[:2])).all(), "non-finite output"

    times = []
    keys = [jax.random.PRNGKey(2 + i)
            for i in range(args.iters * args.chain)]
    ki = iter(keys)
    for i in range(args.iters):
        t0 = time.time()
        for _ in range(args.chain):
            motion = sample(params, batch, next(ki))
        # forced one-row host fetch: a robust barrier over the axon
        # tunnel, where block_until_ready can return early (see the
        # train-mode note); costs ~0.1 ms of transfer.  The device
        # executes queued dispatches in order, so fetching the LAST
        # chained output waits for all of them.
        np.asarray(motion[:1])
        times.append((time.time() - t0) / args.chain)

    if args.trace:
        with jax.profiler.trace(args.trace):
            motion = sample(params, batch, jax.random.PRNGKey(99))
            motion.block_until_ready()
        print(f"# profiler trace written to {args.trace}", file=sys.stderr)

    best = min(times)
    # run-to-run spread: the tunneled chip varies up to ~8% on WEG-class
    # runs (docs/BENCHMARKS.md) — publish the bar with every number
    spread_pct = (max(times) - best) / best * 100
    clips_per_sec = args.batch / best / n_chips
    n_dev = jax.local_device_count()
    weg_tag = "_weg" if args.weg else ""
    result = {
        "metric": f"clips_per_sec_{args.steps}step_{args.sampler}"
                  f"{weg_tag}",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 50.0, 3),
    }
    print(json.dumps(result))
    print(
        f"# batch={args.batch} steps={args.steps} dtype={args.dtype} "
        f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms "
        f"mean={sum(times) / len(times) * 1e3:.1f}ms "
        f"spread={spread_pct:.1f}% devices={n_dev} "
        f"mesh={n_chips} platform={jax.devices()[0].platform}",
        file=sys.stderr)

    if args.mfu and n_chips > 1:
        print("# --mfu is single-chip-only: cost_analysis() of an "
              "SPMD-partitioned executable reports per-device FLOPs, "
              "which would double-count the mesh division. Run --mfu "
              "without --mesh.", file=sys.stderr)
    elif args.mfu:
        # XLA cost_analysis counts the lax.scan body ONCE, so the whole-jit
        # number wildly undercounts a 50-step sampler.  Scan-aware total:
        # whole-jit flops (fixed cost + 1 step) + (steps-1) x per-step
        # flops from lowering one guided denoiser call.
        whole = _xla_flops(
            sample, (params, batch, jax.random.PRNGKey(1)))
        step_flops = None
        try:
            cond_r, masks_r = model.encode_conditions(
                params, batch["spk_ids"], batch["spk_tmask"],
                batch["lsn_ids"], batch["lsn_tmask"], batch["melspec_lsn"],
                batch["active_passive_lsn"], batch["lsn_id"])
            cond_u, masks_u = model.encode_uncond(params, batch)
            lat = jnp.zeros((args.batch, 2 * model.n_chunks,
                             model.latent_dim), jnp.float32)
            one_step = jax.jit(lambda p, z, t: model.denoiser.apply(
                {"params": p["denoiser"]}, z, t, cond_r, cond_u,
                masks_r, masks_u, method=model.denoiser.guided)[0])
            step_flops = _xla_flops(
                one_step, (params, lat, jnp.int32(1)))
        except Exception:
            pass
        if whole and step_flops:
            total = whole + (args.steps - 1) * step_flops
            report_mfu(total, args.batch, best, n_chips,
                       jax.devices()[0].platform, args.dtype,
                       note=f"scan-aware ({step_flops / 1e9:.0f} GF/step)")
        elif whole:
            report_mfu(whole, args.batch, best, n_chips,
                       jax.devices()[0].platform, args.dtype,
                       note="whole-jit only (scan body counted once)")


# bf16 peak matmul throughput per chip (jax-ml.github.io/scaling-book)
PEAK_FLOPS = {"tpu v5 lite": 197e12, "tpu v5e": 197e12, "tpu v4": 275e12,
              "tpu v6 lite": 918e12, "tpu v6e": 918e12}


def _xla_flops(jitted, example_args):
    """Total FLOPs of one call from XLA's cost analysis (None if the
    backend doesn't report it)."""
    try:
        ca = jitted.lower(*example_args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def report_mfu(flops, batch, secs, n_chips, platform, dtype, note=""):
    import jax

    flops_per_clip = flops / batch
    achieved = flops / secs / n_chips
    kind = getattr(jax.devices()[0], "device_kind", platform).lower()
    peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
    mfu = f"{achieved / peak * 100:.1f}%" if peak else "n/a (unknown peak)"
    print(
        f"# flops/clip={flops_per_clip / 1e9:.2f} GF "
        f"achieved={achieved / 1e12:.2f} TFLOP/s/chip mfu={mfu} "
        f"device_kind={kind} dtype={dtype} {note}",
        file=sys.stderr)


if __name__ == "__main__":
    main()
