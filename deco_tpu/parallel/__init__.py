from deco_tpu.parallel import mesh
