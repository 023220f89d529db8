from deco_tpu.ops import block_dct
