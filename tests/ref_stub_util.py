"""CPU-host shims for importing reference torch modules in this image.

The reference tree assumes a GPU cluster image with timm / torchvision /
flash_attn / LPIPS weights installed; none of those exist here. These stubs
provide exactly the surface the reference modules touch on a CPU host:
DropPath at rate 0 (identity), trunc_normal_, the ImageNet normalization
constants and transform, and a param-free PerceptualLoss. All additions are
returned so callers can remove them from sys.modules on teardown (the
torchvision stub in particular must not leak into torchvision-gated tests).
"""

import sys
import types


def _mod(name):
    import importlib.machinery

    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def ensure_module(name, added):
    """Get-or-create a stub module in sys.modules, recording additions."""
    if name not in sys.modules:
        sys.modules[name] = _mod(name)
        added.append(name)
    return sys.modules[name]


def install_stubs(torch):
    """Additively stub timm / torchvision / perceptual_loss; return the
    sys.modules keys that were newly added (for teardown)."""
    added = []

    def _ensure(name):
        return ensure_module(name, added)

    timm = _ensure("timm")
    data = _ensure("timm.data")
    const = _ensure("timm.data.constants")
    if not hasattr(const, "IMAGENET_DEFAULT_MEAN"):
        const.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
        const.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    # some reference files do `from timm.data import IMAGENET_DEFAULT_MEAN`
    data.IMAGENET_DEFAULT_MEAN = const.IMAGENET_DEFAULT_MEAN
    data.IMAGENET_DEFAULT_STD = const.IMAGENET_DEFAULT_STD
    data.constants = const
    timm.data = data

    models = _ensure("timm.models")
    layers = _ensure("timm.models.layers")
    if not hasattr(layers, "DropPath"):
        class DropPath(torch.nn.Identity):
            def __init__(self, *a, **k):
                super().__init__()

        layers.DropPath = DropPath
    if not hasattr(layers, "trunc_normal_"):
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
    registry = _ensure("timm.models.registry")
    if not hasattr(registry, "register_model"):
        registry.register_model = lambda fn: fn
    vit_mod = _ensure("timm.models.vision_transformer")
    if not hasattr(vit_mod, "Block"):
        vit_mod.Block = torch.nn.Module
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit_mod
    timm.models = models

    try:
        from torchvision.transforms import Normalize  # noqa: F401
    except Exception:
        tv = _ensure("torchvision")
        tr = _ensure("torchvision.transforms")
        if not hasattr(tr, "Normalize"):
            class Normalize:
                def __init__(self, mean, std):
                    self.mean, self.std = mean, std

                def __call__(self, x):
                    mean = torch.as_tensor(
                        self.mean, dtype=x.dtype).view(1, -1, 1, 1)
                    std = torch.as_tensor(
                        self.std, dtype=x.dtype).view(1, -1, 1, 1)
                    return (x - mean) / std

            tr.Normalize = Normalize
        tu = _ensure("torchvision.utils")
        if not hasattr(tu, "save_image"):
            tu.save_image = lambda *a, **k: None
        tv.utils = tu
        tv.transforms = tr

    name = "src.models.modules.perceptual_loss"
    try:
        __import__(name)
    except Exception:
        pl = _mod(name)

        class PerceptualLoss(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, a, b):
                return torch.zeros(a.shape[0])

        pl.PerceptualLoss = PerceptualLoss
        sys.modules[name] = pl
        added.append(name)
    return added


def remove_stubs(added):
    for k in added:
        sys.modules.pop(k, None)
