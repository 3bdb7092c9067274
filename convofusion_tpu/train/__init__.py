from convofusion_tpu.train.trainer import Trainer, make_optimizer
