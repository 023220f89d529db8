from deco_tpu.models.gan import discriminator, vae_loss
