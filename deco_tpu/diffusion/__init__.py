from deco_tpu.diffusion import scheduling, training, sampling, adam_sampling, ddpm_sampling, guidance, pre_integral
