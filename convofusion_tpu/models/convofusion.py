"""Convofusion model-type: two-stage training + modality-guided sampling.

Reference: convofusion/models/modeltype/convofusion.py (the LightningModule
orchestrating stage-1 VAE and stage-2 diffusion, 7-way modality
classifier-free guidance, and word-excitation guidance).

TPU-first re-design:
  * pure-function API over an explicit param pytree
    {vae, denoiser, text_encoder, audio_encoder, condition_fuser} — ready
    for optax/pjit; no module state.
  * the reverse diffusion loop is a single ``lax.scan`` over timesteps with
    the 7-way guidance fold in the batch dimension (convofusion.py:499-541).
  * conditions are encoded ONCE for the real batch and once for the uncond
    batch; the 7-way memory is assembled by static per-branch stream
    selection instead of re-running the encoders on a 7x batch (equivalent
    math to convofusion.py:909-929, 5x less T5/audio-encoder work).
  * modality dropout for training runs on device from a PRNG key
    (convofusion.py:745-779 does it host-side on python lists).
  * word-excitation guidance compiles into the scan body behind a static
    flag (lax.while_loop refinement, models/weg.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from convofusion_tpu.config import instantiate_from_config
from convofusion_tpu.diffusion.schedulers import DiffusionScheduler
from convofusion_tpu.losses.diffvae import diffusion_losses, vae_losses
from convofusion_tpu.models import weg as weg_lib
from convofusion_tpu.models.condfuser import TextAudioMotionFuser
from convofusion_tpu.models.tokenizer import (
    UNCOND_TEXT,
    WordHashTokenizer,
    make_tokenizer,
)
from convofusion_tpu.ops.smoothing import laplace_filter_time

# guidance branch -> condition stream kept real (convofusion.py:528-541):
# [all_drop, text, audio, spk, apb, lsnid, full]
GUIDANCE_BRANCHES = (
    (),                      # 0: unconditional
    ("tlsn",),               # 1: listener text only
    ("alsn",),               # 2: listener audio only
    ("spkemb",),             # 3: speaker text only
    ("apb",),                # 4: active/passive only
    ("lsnemb",),             # 5: listener id only
    ("spkemb", "alsn", "tlsn", "apb", "lsnemb"),  # 6: full condition
)
NUM_BRANCHES = len(GUIDANCE_BRANCHES)


def uncond_melspec(shape, dtype=jnp.float32):
    """-90 dB everywhere except mel bins 40:45 (convofusion.py:214-216)."""
    mel = jnp.full(shape, -90.0, dtype)
    return mel.at[..., 40:45].set(0.0)


class Convofusion:
    """Coordinator owning module definitions, schedulers and pure step fns."""

    def __init__(self, cfg, tokenizer=None):
        self.cfg = cfg
        self.stage = cfg.TRAIN.STAGE
        self.condition = cfg.model.condition
        self.nfeats = int(cfg.DATASET.NFEATS)
        self.njoints = int(cfg.DATASET.NJOINTS)
        self.latent_size = int(cfg.model.latent_dim[0])
        self.latent_dim = int(cfg.model.latent_dim[-1])
        self.guidance_scale = float(cfg.model.guidance_scale)
        self.guidance_uncondp = float(cfg.model.guidance_uncondp)
        self.clf_guidance_drops = 6
        self.do_classifier_free_guidance = self.guidance_scale > 1.0
        self.predict_epsilon = bool(cfg.TRAIN.ABLATION.PREDICT_EPSILON)
        self.max_len = int(cfg.DATASET.SAMPLER.MAX_LEN)
        self.n_chunks = self.max_len // 16
        self.text_pad_len = int(cfg.get("TPU", {}).get("TEXT_PAD_LEN", 64))
        self.weg_parameters = cfg.model.get("weg_parameters", {})

        # vae ablation type (reference convofusion.py:66-72): 'no' runs
        # the diffusion directly on motion features — the latent space is
        # the identity, z = motion (B, max_len, nfeats), and decode is a
        # no-op (reference :258-260, :403-420, :723-730).
        # Resolution: the schema key TRAIN.ABLATION.VAE_TYPE (base.yaml)
        # first, then the reference's cfg.model.vae_type, then derive
        # from the motion_vae target name like the reference's except
        # path.  NB YAML 1.1 parses an unquoted `no` as False — that is
        # this ablation's most natural spelling, so normalize it.
        def _norm(v):
            return "no" if v is False else str(v)

        vae_type = cfg.model.get("vae_type")  # explicit override first
        if vae_type is None:
            try:
                vae_type = cfg.TRAIN.ABLATION.get("VAE_TYPE")
            except (KeyError, AttributeError):
                pass
        self.vae_type = (_norm(vae_type) if vae_type is not None
                         else str(cfg.model.motion_vae.target).split(
                             ".")[-1].lower().replace("vae", ""))
        if self.vae_type == "no":
            self.latent_tokens = self.max_len
            self.latent_dim = self.nfeats
            self.vae = None
            self.laplace_kernel_size = 0
        else:
            self.latent_tokens = 2 * self.n_chunks
            self.vae = instantiate_from_config(cfg.model.motion_vae)
            self.laplace_kernel_size = int(
                cfg.model.motion_vae.params.get("laplace_kernel_size", 0))
        ds_name = cfg.TRAIN.DATASETS[0].upper()
        try:
            self.bones = [tuple(b) for b in cfg.DATASET[ds_name].BONES]
        except (KeyError, AttributeError):
            self.bones = None

        vocab_size, modelpath = 32128, "t5-base"
        try:
            vocab_size = int(
                cfg.model.text_encoder.params.get("vocab_size", 32128))
            modelpath = str(
                cfg.model.text_encoder.params.get("modelpath", "t5-base"))
        except (KeyError, AttributeError):
            pass
        if tokenizer is not None:
            self.tokenizer = tokenizer
        elif vocab_size != 32128:
            # custom/tiny text-encoder vocab (tests): real t5 ids would fall
            # outside the embedding table — keep the in-range hash tokenizer
            self.tokenizer = WordHashTokenizer(
                vocab_size=vocab_size, max_length=self.text_pad_len)
        else:
            # production: exact t5-base tokenization when assets exist
            # (reference t5.py:24-28), hash fallback otherwise
            self.tokenizer = make_tokenizer(
                modelpath, max_length=self.text_pad_len,
                vocab_size=vocab_size)

        if self.stage in ("diffusion", "vae_diffusion"):
            self.text_encoder = instantiate_from_config(cfg.model.text_encoder)
            self.audio_encoder = instantiate_from_config(
                cfg.model.audio_encoder)
            self.condition_fuser = TextAudioMotionFuser(
                out_dim=int(cfg.model.denoiser.params.text_encoded_dim))
            extra = {}
            if bool(cfg.get("TPU", {}).get("REMAT", False)):
                # per-layer gradient rematerialization in the train step
                # (see ops/transformer.py DenoiserDecoder.remat)
                extra["remat"] = True
            self.denoiser = instantiate_from_config(
                cfg.model.denoiser, **extra)

            def _sched(block):
                params = dict(block.params)
                params.pop("variance_type", None)
                variant = block.get("variant", params.pop("variant", "ddpm"))
                if not self.predict_epsilon:
                    params["prediction_type"] = "sample"
                from convofusion_tpu.diffusion.schedulers import (
                    scheduler_from_config,
                )
                return scheduler_from_config(
                    params, eta=float(block.get("eta", 0.0)),
                    variant=str(variant))

            self.scheduler: DiffusionScheduler = _sched(cfg.model.scheduler)
            self.noise_scheduler: DiffusionScheduler = _sched(
                cfg.model.noise_scheduler)
            self.num_inference_timesteps = int(
                cfg.model.scheduler.get("num_inference_timesteps", 1000))
            # fused pallas guidance+scheduler step (exact math; see
            # ops/pallas_step.py) — on by default, interpret mode off-TPU
            self.use_pallas_step = bool(
                cfg.get("TPU", {}).get("PALLAS_STEP", True))
            # sampler scan unroll factor: >1 lets XLA fuse across
            # adjacent steps at the cost of compile time (perf knob,
            # bench.py --unroll)
            self.scan_unroll = int(
                cfg.get("TPU", {}).get("SCAN_UNROLL", 1))

    # ------------------------------------------------------------ init params
    def init_params(self, key) -> Dict:
        """Parameter init under ONE jit: eager flax ``init`` dispatches
        thousands of tiny ops, each a separate XLA mini-compile (measured
        198 s for the tiny model on a 1-CPU host; one compiled program
        takes seconds)."""
        if not hasattr(self, "_init_params_jit"):
            self._init_params_jit = jax.jit(self._init_params_impl)
        return self._init_params_jit(key)

    def _init_params_impl(self, key) -> Dict:
        keys = jax.random.split(key, 5)
        b, t = 2, self.text_pad_len
        params = {}
        if self.vae is not None:
            params["vae"] = self.vae.init(
                {"params": keys[0]},
                jnp.zeros((b, self.max_len, self.nfeats)),
            )["params"]
        if self.stage in ("diffusion", "vae_diffusion"):
            ids = jnp.zeros((b, t), jnp.int32)
            tmask = jnp.ones((b, t), bool)
            params["text_encoder"] = self.text_encoder.init(
                {"params": keys[1]}, ids, tmask)["params"]
            mel = jnp.zeros((b, 161, 80))
            params["audio_encoder"] = self.audio_encoder.init(
                {"params": keys[2]}, mel)["params"]
            d = self.denoiser.text_encoded_dim
            params["condition_fuser"] = self.condition_fuser.init(
                {"params": keys[3]},
                jnp.zeros((b, t, d)), jnp.zeros((b, 161, d)),
                jnp.zeros((b, t, d)), jnp.zeros((b, self.n_chunks),
                                                jnp.int32),
                jnp.zeros((b,), jnp.int32))["params"]
            cond = {
                "spkemb": jnp.zeros((b, t, d)),
                "alsn": jnp.zeros((b, 161, d)),
                "tlsn": jnp.zeros((b, t, d)),
                "apb": jnp.zeros((b, self.n_chunks, d)),
                "lsnemb": jnp.zeros((b, 1, d)),
            }
            params["denoiser"] = self.denoiser.init(
                {"params": keys[4]},
                jnp.zeros((b, self.latent_tokens, self.latent_dim)),
                jnp.zeros((), jnp.int32), cond)["params"]
        return params

    # ------------------------------------------------------- host-side helpers
    def tokenize(self, texts):
        return self.tokenizer(list(texts), pad_to=self.text_pad_len)

    def prepare_text_batch(self, texts_spk, texts_lsn):
        """Host-side: strings -> static-shape id/mask arrays incl. the shared
        uncond row."""
        tb_spk = self.tokenize(texts_spk)
        tb_lsn = self.tokenize(texts_lsn)
        tb_unc = self.tokenize([UNCOND_TEXT] * len(texts_lsn))
        return {
            "spk_ids": jnp.asarray(tb_spk.input_ids),
            "spk_tmask": jnp.asarray(tb_spk.attention_mask),
            "lsn_ids": jnp.asarray(tb_lsn.input_ids),
            "lsn_tmask": jnp.asarray(tb_lsn.attention_mask),
            "uncond_ids": jnp.asarray(tb_unc.input_ids),
            "uncond_tmask": jnp.asarray(tb_unc.attention_mask),
        }, tb_spk, tb_lsn

    # ------------------------------------------------------------- vae stage
    def vae_encode(self, params, motion, sample_key=None,
                   deterministic=True):
        return self.vae.apply(
            {"params": params["vae"]}, motion, sample_key, deterministic,
            method=self.vae.encode)

    def vae_decode(self, params, z, nframes=None, deterministic=True):
        return self.vae.apply(
            {"params": params["vae"]}, z, nframes or self.max_len,
            deterministic, method=self.vae.decode)

    def encode_vae_posterior(self, params, motion):
        """Frozen-VAE posterior for the stage-2 cached-latent path.

        The VAE is frozen during diffusion training (convofusion.py:78-82)
        and its encoder runs in eval mode, so (mu, logvar) are a pure
        function of the motion — cacheable per sample.  Returned
        BATCH-LEADING as (B, 2, n_chunks, D) each, so per-sample cache
        slices / data-parallel batch sharding work on axis 0;
        ``train_diffusion_loss`` transposes back and draws the
        reparameterization noise in-step (bit-identical to the uncached
        path under the same key)."""
        _, (mu, logvar), _ = self.vae_encode(params, motion)
        return (jnp.transpose(mu, (1, 0, 2, 3)),
                jnp.transpose(logvar, (1, 0, 2, 3)))

    def train_vae_loss(self, params, batch, key) -> Tuple[jnp.ndarray, Dict]:
        """Stage-1 loss (convofusion.py:647-715 + losses update)."""
        if self.vae is None:
            # reference convofusion.py:652-664 raises for non-vae types
            # in the vae stage
            raise TypeError(
                "vae stage requires a motion VAE (vae_type != 'no')")
        motion = batch["motion"]
        k_sample, k_drop = jax.random.split(key)
        (latent, (mu, logvar), _) = self.vae.apply(
            {"params": params["vae"]}, motion, k_sample, False,
            method=self.vae.encode, rngs={"dropout": k_drop})
        recon = self.vae.apply(
            {"params": params["vae"]}, latent, motion.shape[1], False,
            method=self.vae.decode, rngs={"dropout": k_drop})

        if self.laplace_kernel_size > 0:
            lap_ref = laplace_filter_time(motion, self.laplace_kernel_size)
            lap_rst = laplace_filter_time(recon, self.laplace_kernel_size)
        else:
            lap_ref = lap_rst = None

        losses = vae_losses(
            recon, motion, mu, logvar, lap_rst, lap_ref,
            bones=self.bones,
            lambda_rec=float(self.cfg.LOSS.LAMBDA_REC),
            lambda_kl=float(self.cfg.LOSS.LAMBDA_KL),
            lambda_bl=float(self.cfg.LOSS.get("LAMBDA_BL", 0.0)),
        )
        return losses["total"], losses

    def train_vae_diffusion_loss(self, params, batch, key
                                 ) -> Tuple[jnp.ndarray, Dict]:
        """Joint 'vae_diffusion' stage (convofusion.py:1097-1109): VAE
        losses (trainable VAE) + diffusion losses on the same batch.

        NB the reference additionally logs a gen_feature term computed
        from a no_grad sampling pass — it is detached there, so it never
        contributes gradient; we surface generation quality through the
        eval pipeline instead.
        """
        k_vae, k_diff = jax.random.split(key)
        vae_batch = {"motion": batch["motion_lsn"]}
        vae_total, vae_losses_d = self.train_vae_loss(
            params, vae_batch, k_vae)
        diff_total, diff_losses_d = self.train_diffusion_loss(
            params, batch, k_diff)
        losses = {**{f"vae_{k}": v for k, v in vae_losses_d.items()},
                  **diff_losses_d}
        losses["total"] = vae_total + diff_total
        return losses["total"], losses

    # ------------------------------------------------------ condition encoding
    def encode_text(self, params, ids, tmask, deterministic=True, rngs=None):
        emb, _ = self.text_encoder.apply(
            {"params": params["text_encoder"]}, ids, tmask,
            deterministic, rngs=rngs)
        return emb

    def encode_text_trunk(self, params, ids, tmask):
        """Frozen T5 trunk only — the pre-projection hidden states.

        The trunk never trains and runs in eval mode (reference t5.py:35-37
        puts ``text_model`` in ``.training = False`` with requires_grad
        off), so its output is a pure function of the text: per-text trunk
        activations can be computed once and cached out of the train step,
        which removes ~3/4 of the step FLOPs (the 12-layer T5 forward x 2
        streams dwarfs the ~30 M-param denoiser).  The trainable
        ``projection_1`` stays in-graph (``project_trunk``).
        """
        from convofusion_tpu.models.t5 import T5EncoderStack

        te = self.text_encoder
        stack = T5EncoderStack(
            te.vocab_size, te.d_model, te.d_ff, te.num_layers,
            te.num_heads, te.d_kv, te.dropout, dtype=te.dtype)
        hidden = stack.apply(
            {"params": params["text_encoder"]["text_model"]}, ids, tmask)
        return jax.lax.stop_gradient(hidden)

    def project_trunk(self, params, trunk):
        """Trainable ReLU+Linear head over (cached) trunk activations —
        identical math to the tail of T5TextEncoder.__call__."""
        import flax.linen as nn

        te = self.text_encoder
        return nn.Dense(te.latent_dim, dtype=te.dtype).apply(
            {"params": params["text_encoder"]["projection_1"]},
            nn.relu(trunk))

    def encode_conditions(self, params, spk_ids, spk_tmask, lsn_ids,
                          lsn_tmask, melspec_lsn, apb, lsn_id,
                          deterministic=True, rngs=None):
        """Returns (cond dict, mask dict).  Masks are torch-convention pad
        masks (True = pad), matching convofusion.py:813."""
        tspk = self.encode_text(params, spk_ids, spk_tmask, deterministic,
                                rngs)
        tlsn = self.encode_text(params, lsn_ids, lsn_tmask, deterministic,
                                rngs)
        alsn = self.audio_encoder.apply(
            {"params": params["audio_encoder"]}, melspec_lsn,
            deterministic, rngs=rngs)
        cond = self.condition_fuser.apply(
            {"params": params["condition_fuser"]}, tspk, alsn, tlsn, apb,
            lsn_id)
        masks = {"spkemb": ~spk_tmask, "tlsn": ~lsn_tmask}
        return cond, masks

    def encode_conditions_precomputed(self, params, spk_trunk, spk_tmask,
                                      lsn_trunk, lsn_tmask, melspec_lsn,
                                      apb, lsn_id, deterministic=True,
                                      rngs=None):
        """encode_conditions with the frozen T5 trunk replaced by cached
        activations (see encode_text_trunk); identical outputs."""
        tspk = self.project_trunk(params, spk_trunk)
        tlsn = self.project_trunk(params, lsn_trunk)
        alsn = self.audio_encoder.apply(
            {"params": params["audio_encoder"]}, melspec_lsn,
            deterministic, rngs=rngs)
        cond = self.condition_fuser.apply(
            {"params": params["condition_fuser"]}, tspk, alsn, tlsn, apb,
            lsn_id)
        masks = {"spkemb": ~spk_tmask, "tlsn": ~lsn_tmask}
        return cond, masks

    # --------------------------------------------------- diffusion train step
    def _dropout_groups(self, key, batch_size: int):
        """Per-sample guidance-drop group (6 = keep everything).

        Mirrors convofusion.py:745-752: 6 disjoint random groups of
        ``int(uncondp * B)`` samples each.
        """
        k = int(self.guidance_uncondp * batch_size)
        perm = jax.random.permutation(key, batch_size)
        group = jnp.full((batch_size,), NUM_BRANCHES - 1, jnp.int32)
        for g in range(self.clf_guidance_drops):
            group = group.at[perm[g * k:(g + 1) * k]].set(g)
        return group

    def apply_modality_dropout(self, key, batch):
        """Substitute uncond values per dropped modality (on device).

        Works on either batch layout: token ids (``lsn_ids``/``spk_ids``)
        or cached trunk activations (``lsn_trunk``/``spk_trunk``) — the
        uncond rows may be a single broadcastable (1, ...) entry."""
        b = batch["lsn_tmask"].shape[0]
        group = self._dropout_groups(key, b)

        def keep(stream):
            kept = jnp.zeros((b,), bool)
            for g, streams in enumerate(GUIDANCE_BRANCHES):
                if stream in streams:
                    kept = kept | (group == g)
            return kept

        out = dict(batch)
        k_t = keep("tlsn")[:, None]
        k_s = keep("spkemb")[:, None]
        if "lsn_ids" in batch:
            out["lsn_ids"] = jnp.where(k_t, batch["lsn_ids"],
                                       batch["uncond_ids"])
            out["spk_ids"] = jnp.where(k_s, batch["spk_ids"],
                                       batch["uncond_ids"])
        out["lsn_tmask"] = jnp.where(k_t, batch["lsn_tmask"],
                                     batch["uncond_tmask"])
        out["spk_tmask"] = jnp.where(k_s, batch["spk_tmask"],
                                     batch["uncond_tmask"])
        k_a = keep("alsn")[:, None, None]
        out["melspec_lsn"] = jnp.where(
            k_a, batch["melspec_lsn"],
            uncond_melspec(batch["melspec_lsn"].shape,
                           batch["melspec_lsn"].dtype))
        k_apb = keep("apb")[:, None]
        out["active_passive_lsn"] = jnp.where(
            k_apb, batch["active_passive_lsn"],
            jnp.full_like(batch["active_passive_lsn"], 2))
        k_id = keep("lsnemb")
        out["lsn_id"] = jnp.where(k_id, batch["lsn_id"], 0)
        if "lsn_trunk" in batch:
            # cached-trunk batches: substitute the uncond trunk rows the
            # same way the id rows are substituted above
            out["lsn_trunk"] = jnp.where(
                k_t[..., None], batch["lsn_trunk"], batch["uncond_trunk"])
            out["spk_trunk"] = jnp.where(
                k_s[..., None], batch["spk_trunk"], batch["uncond_trunk"])
        return out

    def train_diffusion_loss(self, params, batch, key
                             ) -> Tuple[jnp.ndarray, Dict]:
        """Stage-2 loss (convofusion.py:717-815 + _diffusion_process)."""
        k_enc, k_drop, k_noise, k_t, k_dropout = jax.random.split(key, 5)

        # frozen VAE encode (reparameterized sample, stop-gradient)
        if "vae_mu" in batch:
            # cached-posterior layout (cli/train TPU.CACHE_VAE_POSTERIOR):
            # the frozen VAE's (mu, logvar) are a pure function of the
            # motion, precomputed host-side; only the reparameterization
            # noise stays in-step, drawn with the SAME key/shape/dtype as
            # vae.encode would (models/vae.py:177-179) — bit-identical
            # loss, no tiny-GEMM encoder forward in the step
            mu = jnp.transpose(batch["vae_mu"], (1, 0, 2, 3))
            logvar = jnp.transpose(batch["vae_logvar"], (1, 0, 2, 3))
            std = jnp.exp(0.5 * logvar)
            latent = mu + std * jax.random.normal(k_enc, mu.shape,
                                                  mu.dtype)
        elif self.vae_type == "no":
            # identity latent space (reference convofusion.py:723-727):
            # the motion features ARE the diffusion variables
            latent = None
        else:
            latent, _, _ = self.vae_encode(
                jax.lax.stop_gradient(params), batch["motion_lsn"],
                sample_key=k_enc)
        if latent is None:
            z = jax.lax.stop_gradient(batch["motion_lsn"])
            b = z.shape[0]
        else:
            latent = jax.lax.stop_gradient(latent)
            # (2, B, 8, D) -> (B, 16, D) interleaved body/hands per chunk
            z = jnp.transpose(latent, (1, 2, 0, 3))
            b = z.shape[0]
            z = z.reshape(b, 2 * self.n_chunks, self.latent_dim)

        dropped = self.apply_modality_dropout(k_drop, batch)
        rngs = {"dropout": k_dropout}
        if "lsn_trunk" in batch:
            cond, masks = self.encode_conditions_precomputed(
                params, dropped["spk_trunk"], dropped["spk_tmask"],
                dropped["lsn_trunk"], dropped["lsn_tmask"],
                dropped["melspec_lsn"], dropped["active_passive_lsn"],
                dropped["lsn_id"], deterministic=False, rngs=rngs)
        else:
            cond, masks = self.encode_conditions(
                params, dropped["spk_ids"], dropped["spk_tmask"],
                dropped["lsn_ids"], dropped["lsn_tmask"],
                dropped["melspec_lsn"], dropped["active_passive_lsn"],
                dropped["lsn_id"], deterministic=False, rngs=rngs)

        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        timesteps = jax.random.randint(
            k_t, (b,), 0, self.noise_scheduler.num_train_timesteps)
        noisy = self.noise_scheduler.add_noise(z, noise, timesteps)

        noise_pred, att = self.denoiser.apply(
            {"params": params["denoiser"]}, noisy, timesteps, cond, masks,
            deterministic=False, rngs=rngs)

        lambda_latent = float(self.cfg.LOSS.LAMBDA_LATENT)
        lambda_prior = float(self.cfg.LOSS.get("LAMBDA_PRIOR", 0.0))
        lambda_ga = float(
            self.cfg.LOSS.get("LAMBDA_GUIDED_ATTENTION", 0.0))
        target = noise if self.predict_epsilon else z

        # prior loss: batch-chunk predictions (convofusion.py:590-593,
        # diffvae.py:152-156) — epsilon-prediction only, like the reference
        np_main, np_prior, n_prior = noise_pred, None, None
        tgt_main = target
        if lambda_prior != 0.0:
            if not self.predict_epsilon:
                raise ValueError(
                    "LAMBDA_PRIOR requires PREDICT_EPSILON (the reference's "
                    "x-prediction path never chunks the target)")
            # torch.chunk semantics: first half gets the extra row when
            # the batch is odd (convofusion.py:592-593)
            h = (noise_pred.shape[0] + 1) // 2
            np_main, np_prior = noise_pred[:h], noise_pred[h:]
            tgt_main, n_prior = target[:h], target[h:]

        kwargs = dict(
            noise_pred_prior=np_prior, noise_prior=n_prior,
            lambda_prior=lambda_prior,
            att_mats=att if lambda_ga != 0.0 else None,
            lambda_guided_attention=lambda_ga)
        if lambda_latent != 0.0:
            # with prior chunking active the latent term covers the main
            # (conditional) chunk only, keeping the two terms disjoint —
            # the reference has no defined semantics for the combination
            # (its _diffusion_process crashes when both lambdas are
            # nonzero: half-length drop_idxs index the full batch)
            h = np_main.shape[0]
            pred_x0 = jax.vmap(
                lambda mo, t, s: self.scheduler.pred_original_sample(
                    mo, t, s))(np_main, timesteps[:h], noisy[:h])
            weights = jnp.asarray(self.scheduler.betas)[timesteps[:h]]
            losses = diffusion_losses(
                np_main, tgt_main, self.predict_epsilon, pred_x0, z[:h],
                weights, lambda_latent, **kwargs)
        else:
            losses = diffusion_losses(np_main, tgt_main,
                                      self.predict_epsilon, **kwargs)
        return losses["total"], losses

    # ------------------------------------------------------------- sampling
    def assemble_guidance_cond(self, cond_real, masks_real, cond_unc,
                               masks_unc):
        """Stack the 7 guidance branches into a (7B, ...) condition set.

        The uncond entries may be single broadcastable rows (see
        :meth:`encode_uncond`) — they are tiled to the real batch here."""
        def unc(u, r):
            return jnp.broadcast_to(u, r.shape[:1] + u.shape[1:])

        cond7, masks7 = {}, {}
        for s in cond_real:
            rows = [cond_real[s] if s in GUIDANCE_BRANCHES[g] else
                    unc(cond_unc[s], cond_real[s])
                    for g in range(NUM_BRANCHES)]
            cond7[s] = jnp.concatenate(rows, axis=0)
        for s in masks_real:
            rows = [masks_real[s] if s in GUIDANCE_BRANCHES[g] else
                    unc(masks_unc[s], masks_real[s])
                    for g in range(NUM_BRANCHES)]
            masks7[s] = jnp.concatenate(rows, axis=0)
        return cond7, masks7

    def guidance_combine_branches(self, chunks):
        """uncond + gs * sum(single-modality - uncond), full-cond weight 0
        (convofusion.py:527-541).  chunks (7, B, ...)."""
        uncond = chunks[0]
        single = jnp.sum(chunks[1:6], axis=0)
        return uncond + self.guidance_scale * (single - 5.0 * uncond)

    def guidance_combine(self, noise_pred7, batch_size: int):
        """Flat (7B, ...) variant of guidance_combine_branches."""
        return self.guidance_combine_branches(noise_pred7.reshape(
            (NUM_BRANCHES, batch_size) + noise_pred7.shape[1:]))

    def diffusion_reverse(
        self,
        params,
        cond_real,
        masks_real,
        cond_unc,
        masks_unc,
        key,
        batch_size: int,
        num_inference_steps: Optional[int] = None,
        capture_attention: str = "none",
        weg: Optional[Dict] = None,
        preseq: Optional[jnp.ndarray] = None,
        weg_params: Optional[Dict] = None,
    ):
        """Reverse process as a lax.scan (convofusion.py:391-549).

        With classifier-free guidance active, the per-step denoiser call
        uses the guidance-aware ``Denoiser.guided`` path: the 7 branches'
        condition memories have only 2 distinct variants per stream, so the
        memory-side K/V work runs once per variant (exact math, ~2x faster
        than tiling the batch 7x).  The fused-streams layout falls back to
        assembling the tiled 7B batch.

        ``weg`` (optional): dict with focus_idx, focus_valid, eot_idx,
        cond_text (B-sized text-only condition), masks_text — enables
        word-excitation guidance inside the loop.

        ``preseq`` (optional, (B, L<=16, D)): previous-window latent tokens
        for long-form synthesis.  At every step the first L tokens are
        overwritten with add_noise(preseq, noise, t) — diffusion
        inpainting of the overlap (unbounded_synthesis.py:70-76).  The
        noise is the initial gaussian at step 0 and the step-0 noised
        preseq afterwards, replicating the reference's in-place aliasing
        of ``init_noise`` (see the body note).
        """
        use_guided = (self.do_classifier_free_guidance
                      and not self.denoiser.fuse_streams)
        # fused pallas guidance+scheduler step: epsilon prediction with
        # eta=0 DDIM or fixed_small DDPM only (ops/pallas_step.py)
        use_pallas = (use_guided and self.use_pallas_step
                      and self.predict_epsilon
                      and self.scheduler.clip_sample
                      and (self.scheduler.variant == "ddpm"
                           or (self.scheduler.variant == "ddim"
                               and self.scheduler.eta == 0.0)))
        is_dpmpp = self.scheduler.variant == "dpmpp_2m"
        if self.do_classifier_free_guidance and not use_guided:
            cond7, masks7 = self.assemble_guidance_cond(
                cond_real, masks_real, cond_unc, masks_unc)
        elif not self.do_classifier_free_guidance:
            cond7, masks7 = cond_real, masks_real
        n_steps = num_inference_steps or self.num_inference_timesteps
        ts = jnp.asarray(self.scheduler.timesteps(n_steps))
        prev_ts = jnp.asarray(self.scheduler.prev_timesteps(n_steps))
        n_tokens = self.latent_tokens

        k_init, k_loop = jax.random.split(key)
        init_noise = jax.random.normal(
            k_init, (batch_size, n_tokens, self.latent_dim)
        ) * self.scheduler.init_noise_sigma
        latents = init_noise
        preseq_len = preseq.shape[1] if preseq is not None else 0
        if preseq is not None:
            # Reference aliasing quirk (unbounded_synthesis.py:66-76): at
            # step 0 `latents` IS `init_noise`, so the in-place overwrite
            # `latents[:, :preseq_len] = noised_preseq` mutates init_noise
            # itself; every later step's `preseq_noise = init_noise.clone()`
            # therefore re-noises with the STEP-0 NOISED PRESEQ, not the
            # raw gaussian.  Replicate exactly (golden-pinned by
            # tests/test_unbounded_golden.py).
            preseq_noise_step0 = init_noise[:, :preseq_len]
            preseq_noise_later = self.noise_scheduler.add_noise(
                preseq, preseq_noise_step0,
                jnp.full((batch_size,), ts[0], jnp.int32))

        weg_enabled = weg is not None
        if weg_enabled:
            # static (trace-time) override — used by the rollout, which
            # replaces the config parameters with the reference's
            # hardcoded forecast constants (unbounded_synthesis.py:83-88)
            wp = (weg_params if weg_params is not None
                  else self.weg_parameters)
            scale_factor = float(wp.get("scale_factor", 1000))
            lo, hi = wp.get("scale_range", [1.0, 0.5])
            schedule = str(wp.get("scale_schedule", "reference"))
            if schedule == "reference":
                # the reference reassigns scale_range INSIDE the step loop
                # (convofusion.py:395,436-441: linspace(sr[0], sr[1], n)
                # every iteration), so the used value collapses to ~lo at
                # every step and the lo->hi decay never happens; replicate
                # the mutated sequence exactly (host-side, cheap)
                sr = [float(lo), float(hi)]
                scale_range = np.empty(n_steps, np.float64)
                for i in range(n_steps):
                    sr = np.linspace(sr[0], sr[1], n_steps)
                    scale_range[i] = sr[i]
            else:
                # 'linspace': the decay the parameters describe (and the
                # Attend-and-Excite source implements)
                scale_range = np.linspace(float(lo), float(hi), n_steps)
            step_sizes = jnp.asarray(
                scale_factor * np.sqrt(scale_range), jnp.float32)
            thresholds = np.full(n_steps, -1.0, np.float32)
            for i, thr in dict(wp.get("thresholds", {})).items():
                if int(i) < n_steps:
                    thresholds[int(i)] = float(thr)
            thresholds = jnp.asarray(thresholds)
            max_iter_to_alter = int(wp.get("max_iter_to_alter", 800))
            max_refinement_steps = int(wp.get("max_refinement_steps", 300))

            # NB on manual K/V sharing: the memory-side LN+K/V of the
            # text-only passes is latent-independent and a subset of the
            # guided pass's variants, so Denoiser.precompute_step_kv /
            # forward_kv / guided(kvs=) can compute it once per step.
            # Measured on v5e (r3): 82.9 vs 87.0 clips/s — XLA already
            # CSEs the identical memory subgraphs across the denoiser
            # calls inside one scan body, and forcing all 9 layers' K/V
            # live at once only costs HBM headroom.  The direct path is
            # kept; the kv API remains for cross-call reuse outside jit.
            if self.denoiser.fuse_streams:
                def text_only_att(lat, t):
                    _, att = self.denoiser.apply(
                        {"params": params["denoiser"]}, lat, t,
                        weg["cond_text"], weg["masks_text"])
                    return att["tlsn"]
            else:
                # single-row uncond streams stay at batch 1 through the
                # memory-side LN+K/V (Denoiser.text_only): unlike the
                # cross-call kv reuse above, this is a real FLOP cut —
                # the broadcast-B uncond memories never existed in the
                # guided pass, so CSE could not share them
                def text_only_att(lat, t):
                    _, att = self.denoiser.apply(
                        {"params": params["denoiser"]}, lat, t,
                        weg["cond_text"], weg["masks_text"],
                        method=self.denoiser.text_only)
                    return att["tlsn"]

            weg_loss = weg_lib.make_weg_loss(
                text_only_att, weg["focus_idx"], weg["focus_valid"],
                weg["eot_idx"])
            weg_loss_grad = jax.value_and_grad(weg_loss, argnums=0)

        def body(carry, inp):
            lat, k, prev_d, prev_lambda = carry
            i, t, pt = inp
            k, k_step = jax.random.split(k)

            if preseq is not None:
                # re-noise the previous half-window to level t and
                # overwrite the overlap (unbounded_synthesis.py:70-76);
                # the noise source switches after step 0 — see the
                # aliasing note at preseq_noise_later above
                preseq_noise = jnp.where(
                    i == 0, preseq_noise_step0, preseq_noise_later)
                noised = self.noise_scheduler.add_noise(
                    preseq, preseq_noise,
                    jnp.full((batch_size,), t, jnp.int32))
                lat = jnp.concatenate(
                    [noised, lat[:, preseq_len:, :]], axis=1)

            if weg_enabled:
                thr = thresholds[i]
                step_size = step_sizes[i]

                def refine(lat):
                    # one fused loss+grad pass decides refinement AND
                    # feeds the single gradient step when refinement does
                    # not trigger (the common case: thresholds exist at a
                    # few steps only) — the reference's second text-only
                    # pass over unchanged latents is mathematically the
                    # same values (convofusion.py:437-496), so reuse them
                    # instead of recomputing (r3: 87.0 -> measured below)
                    loss0, grad0 = weg_loss_grad(lat, t)
                    need = (thr > 0) & (loss0 > 1.0 - thr)

                    def with_refinement(lat):
                        new_lat, _ = weg_lib.iterative_refinement(
                            weg_loss_grad, lat, t, thr, step_size,
                            max_refinement_steps)
                        # post-refinement latents changed: fresh pass
                        loss, grad = weg_loss_grad(new_lat, t)
                        return new_lat, loss, grad

                    lat, loss, grad = jax.lax.cond(
                        need, with_refinement,
                        lambda lat: (lat, loss0, grad0), lat)
                    # single gradient step while i < max_iter_to_alter
                    lat = jnp.where(
                        (i < max_iter_to_alter) & (loss > 0),
                        lat - step_size * grad, lat)
                    return lat

                lat = refine(lat)

            if use_guided:
                noise_pred_b, att = self.denoiser.apply(
                    {"params": params["denoiser"]}, lat, t, cond_real,
                    cond_unc, masks_real, masks_unc,
                    method=self.denoiser.guided)
                att_full = att  # already the full-cond branch
                if use_pallas:
                    from convofusion_tpu.ops.pallas_step import (
                        fused_guided_step,
                    )

                    acp = jnp.asarray(self.scheduler.alphas_cumprod)
                    alpha_t = acp[t]
                    alpha_prev = jnp.where(
                        pt >= 0, acp[jnp.clip(pt, 0)], jnp.float32(1.0))
                    noise = jax.random.normal(k_step, lat.shape, lat.dtype)
                    lat = fused_guided_step(
                        noise_pred_b, lat, noise, alpha_t, alpha_prev,
                        jnp.float32(self.guidance_scale),
                        jnp.float32(
                            1.0 if self.scheduler.variant == "ddpm"
                            else 0.0),
                        (t > 0).astype(jnp.float32),
                        jnp.float32(1.0),
                        interpret=jax.default_backend() != "tpu")
                    y = att_full if capture_attention == "all" else None
                    return (lat, k, prev_d, prev_lambda), y
                noise_pred = self.guidance_combine_branches(noise_pred_b)
            elif self.do_classifier_free_guidance:
                lat_in = jnp.tile(lat, (NUM_BRANCHES, 1, 1))
                noise_pred7, att = self.denoiser.apply(
                    {"params": params["denoiser"]}, lat_in, t, cond7,
                    masks7)
                noise_pred = self.guidance_combine(noise_pred7, batch_size)
                # full-cond branch maps (reference keeps chunk(-1),
                # convofusion.py:517-519)
                att_full = {s: a[-batch_size:] for s, a in att.items()}
            else:
                noise_pred, att_full = self.denoiser.apply(
                    {"params": params["denoiser"]}, lat, t, cond7, masks7)
            if is_dpmpp:
                lat, _, prev_d, prev_lambda = self.scheduler.dpmpp_2m_step(
                    noise_pred, t, pt, lat, prev_d, prev_lambda, i == 0)
            else:
                noise = jax.random.normal(k_step, lat.shape, lat.dtype)
                lat, _ = self.scheduler.step(noise_pred, t, pt, lat,
                                             noise=noise)

            y = att_full if capture_attention == "all" else None
            return (lat, k, prev_d, prev_lambda), y

        steps = (jnp.arange(n_steps), ts, prev_ts)
        carry0 = (latents, k_loop, jnp.zeros_like(latents),
                  jnp.float32(0.0))
        (latents, _, _, _), att_seq = jax.lax.scan(
            body, carry0, steps, unroll=self.scan_unroll)
        return latents, att_seq

    def encode_uncond(self, params, batch):
        """Unconditional branch conditions as SINGLE broadcastable rows.

        Every uncond row is identical (fixed uncond token ids, −90 dB
        mel, apb=2, lsn_id=0), so the branch is encoded at batch 1 and
        broadcast where needed — and inside the sampling scan the
        guided path keeps its per-layer LayerNorm+K/V at batch 1 too
        (ops/attention.grouped_attend shared-KV case), cutting the
        uncond half of the dominant memory-side projection FLOPs to
        1/B.  Callers that sample repeatedly — the windowed rollout,
        serving loops — can compute this ONCE and pass it to
        :meth:`sample` as ``uncond_cache``."""
        mel = batch["melspec_lsn"]
        return self.encode_conditions(
            params, batch["uncond_ids"][:1], batch["uncond_tmask"][:1],
            batch["uncond_ids"][:1], batch["uncond_tmask"][:1],
            uncond_melspec((1,) + mel.shape[1:], mel.dtype),
            jnp.full_like(batch["active_passive_lsn"][:1], 2),
            jnp.zeros_like(batch["lsn_id"][:1]))

    def sample(
        self,
        params,
        batch,
        key,
        num_inference_steps: Optional[int] = None,
        capture_attention: str = "none",
        focus: Optional[Dict] = None,
        deterministic_cond=True,
        preseq: Optional[jnp.ndarray] = None,
        uncond_cache=None,
        weg_params: Optional[Dict] = None,
    ):
        """End-to-end generation for a prepared array batch: encode
        conditions, run guided reverse diffusion, decode motion.

        ``focus``: optional dict(focus_idx, focus_valid) enabling WEG.
        ``uncond_cache``: optional (cond_unc, masks_unc) from
        :meth:`encode_uncond` to skip re-encoding the constant branch.
        ``weg_params``: optional static override of
        ``cfg.model.weg_parameters`` (see :meth:`diffusion_reverse`).
        Returns (motion (B, 128, nfeats), latents (B, 16, D), att_seq).
        """
        b = batch["lsn_ids"].shape[0]
        cond_real, masks_real = self.encode_conditions(
            params, batch["spk_ids"], batch["spk_tmask"], batch["lsn_ids"],
            batch["lsn_tmask"], batch["melspec_lsn"],
            batch["active_passive_lsn"], batch["lsn_id"])
        cond_unc, masks_unc = (uncond_cache if uncond_cache is not None
                               else self.encode_uncond(params, batch))

        weg = None
        if focus is not None:
            # text-only condition = branch 1 selection (tlsn real, rest
            # uncond), matching convofusion.py:449-450
            cond_text = {s: (cond_real[s] if s == "tlsn" else cond_unc[s])
                         for s in cond_real}
            masks_text = {s: (masks_real[s] if s == "tlsn" else
                              masks_unc[s]) for s in masks_real}
            # eot index: first pad position - 1 (convofusion.py:461)
            pad = masks_real["tlsn"]
            any_pad = jnp.any(pad, axis=1)
            first_pad = jnp.argmax(pad.astype(jnp.int32), axis=1)
            eot = jnp.where(any_pad, first_pad - 1, pad.shape[1] - 1)
            weg = dict(
                cond_text=cond_text, masks_text=masks_text,
                focus_idx=jnp.asarray(focus["focus_idx"]),
                focus_valid=jnp.asarray(focus["focus_valid"],
                                        jnp.float32),
                eot_idx=eot)

        latents, att_seq = self.diffusion_reverse(
            params, cond_real, masks_real, cond_unc, masks_unc, key, b,
            num_inference_steps, capture_attention, weg, preseq,
            weg_params)

        if self.vae_type == "no":
            # identity decode: latents are motion features already
            # (reference convofusion.py:258-260)
            motion = latents
        else:
            # (B, 16, D) -> (2, B, 8, D) for the VAE decoder
            z = latents.reshape(b, self.n_chunks, 2, self.latent_dim)
            z = jnp.stack([z[:, :, 0], z[:, :, 1]], axis=0)
            motion = self.vae_decode(params, z)
        return motion, latents, att_seq

    def cached_sampler(self, num_inference_steps=None,
                       capture_attention: str = "none",
                       weg_params: Optional[Dict] = None
                       ) -> "CachedSampler":
        """Persistent :class:`CachedSampler` for these static settings.

        The cache lives on the model, so every caller with the same
        settings — cli/test.py's batch loop, cli/unbounded.py's window
        loop, serving code — shares the compiled executables and the
        per-geometry uncond encodes."""
        caches = getattr(self, "_sampler_caches", None)
        if caches is None:
            caches = self._sampler_caches = {}
        key = (num_inference_steps, capture_attention, repr(weg_params))
        if key not in caches:
            caches[key] = CachedSampler(
                self, num_inference_steps, capture_attention, weg_params)
        return caches[key]


class CachedSampler:
    """Compiled-sampler + uncond-condition cache around
    :meth:`Convofusion.sample`.

    One jitted executable per (focus on/off, preseq on/off) — shape
    changes retrace inside jax.jit's own cache — and one uncond encode
    per batch geometry (the uncond branch depends only on shapes:
    Convofusion.encode_uncond)."""

    def __init__(self, model: Convofusion, num_inference_steps=None,
                 capture_attention: str = "none",
                 weg_params: Optional[Dict] = None):
        self.model = model
        self._fns = {}
        self._uncond = {}
        # identity of the params the cached uncond encodes were computed
        # from; strong references keep the id()s from being recycled
        self._params_leaves = None
        self._encode_uncond = jax.jit(model.encode_uncond)
        self._static = dict(num_inference_steps=num_inference_steps,
                            capture_attention=capture_attention,
                            weg_params=weg_params)

    def invalidate(self):
        """Drop cached uncond encodes (call after updating params in
        place if relying on object identity is undesirable). Compiled
        executables are params-independent and are kept."""
        self._uncond.clear()
        self._params_leaves = None

    def uncond_for(self, params, arrays):
        # the uncond encodes depend on the weights: detect params changes
        # (evaluating several checkpoints in one process, train-then-
        # sample loops, serving update_params) by the identity of EVERY
        # leaf — a partial swap that splices new module weights into an
        # old tree changes some leaf object, even when the first one
        # (any single canary) survives
        leaves = jax.tree_util.tree_leaves(params)
        if self._params_leaves is None or \
                len(leaves) != len(self._params_leaves) or \
                any(a is not b for a, b in zip(leaves,
                                               self._params_leaves)):
            self._uncond.clear()
            self._params_leaves = leaves
        # encode_uncond output is batch-size-independent (single
        # broadcastable rows), so key on the per-sample geometry only and
        # slice to batch 1 before the jit call — a ragged final batch
        # then reuses the cache instead of retracing + re-encoding
        geom = (arrays["uncond_ids"].shape[1:],
                arrays["melspec_lsn"].shape[1:],
                arrays["active_passive_lsn"].shape[1:])
        if geom not in self._uncond:
            slim = {k: arrays[k][:1] for k in (
                "uncond_ids", "uncond_tmask", "melspec_lsn",
                "active_passive_lsn", "lsn_id")}
            self._uncond[geom] = self._encode_uncond(params, slim)
        return self._uncond[geom]

    def __call__(self, params, arrays, key, focus=None, preseq=None):
        fn_key = (focus is not None, preseq is not None)
        if fn_key not in self._fns:
            static = dict(self._static)
            self._fns[fn_key] = jax.jit(
                lambda p, a, k, f, ps, c: self.model.sample(
                    p, a, k, focus=f, preseq=ps, uncond_cache=c,
                    **static))
        return self._fns[fn_key](params, arrays, key, focus, preseq,
                                 self.uncond_for(params, arrays))


def gen_from_latent(model: Convofusion, params, latent, nframes=None):
    """Decode motion straight from a latent (reference convofusion.py:
    287-294 ``gen_from_latent``)."""
    return model.vae_decode(params, latent, nframes)
