from convofusion_tpu.models.vae import ConvoFusionVae
from convofusion_tpu.models.denoiser import Denoiser
