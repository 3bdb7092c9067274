"""ConvoFusion-TPU: a TPU-native (JAX/XLA/Pallas) framework for multi-modal
conversational co-speech gesture synthesis.

Re-designed from scratch for TPU hardware with the capabilities of the
ConvoFusion reference (CVPR 2024): two-stage latent diffusion over chunked
body/hands motion latents, five-stream cross-attention conditioning,
modality-wise classifier-free guidance, word-excitation guidance, and
long-form windowed synthesis.

Layout (mirrors reference layer map, SURVEY.md §1):
  utils/     L0 math & geometry primitives (quaternions, masks, FK)
  ops/       L1 NN operator library (attention, skip transformers, PEs)
  diffusion/ DDPM/DDIM schedulers (scan-friendly, diffusers semantics)
  models/    L2/L3 architectures (VAE, denoiser, T5, audio enc, fuser)
             and the Convofusion model-type (train/sample steps)
  losses/    VAE + diffusion losses
  data/      L4 data pipeline (BEAT/DnD loaders, native mel-spectrogram)
  config/    L5 OmegaConf-compatible config system
  parallel/  mesh + sharding helpers (pjit data/model axes)
  train/     training loop, orbax checkpointing
  eval/      quantitative evaluation (FID, SRGR, diversity, alignment)
  compat/    torch state-dict -> JAX param-tree loaders
  cli/       train / test / unbounded-synthesis entry points
"""

__version__ = "0.1.0"
