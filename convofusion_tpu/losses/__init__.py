from convofusion_tpu.losses.diffvae import (
    diffusion_losses,
    kl_divergence_normal,
    smooth_l1,
    vae_losses,
)
