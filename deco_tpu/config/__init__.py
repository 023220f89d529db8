from deco_tpu.config import registry
from deco_tpu.config.registry import instantiate, load_yaml, resolve
