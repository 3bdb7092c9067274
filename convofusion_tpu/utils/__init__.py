from convofusion_tpu.utils.masks import lengths_to_mask, remove_padding
