from deco_tpu.models.uniflow import components, flow_decoder, model, vit
from deco_tpu.models.uniflow.model import UniFlowConfig, UniFlowVision
