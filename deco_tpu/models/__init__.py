from deco_tpu.models import layers, patching
