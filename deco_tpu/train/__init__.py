from deco_tpu.train import state, train_step
