from .field import DirectField  # noqa: F401
from .torch_import import load_pretrained_ae  # noqa: F401
from .networks import (  # noqa: F401
    AE,
    VAE,
    GoodNetwork,
    ImplicitConv,
    LocalConv2d,
    MultiOutUNet,
    ResNetED,
    UNet,
    UNet3D,
    UNetRes,
)
