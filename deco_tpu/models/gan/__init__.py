from deco_tpu.models.gan import adv_head, discriminator, vae_loss
