from .field import DirectField  # noqa: F401
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
