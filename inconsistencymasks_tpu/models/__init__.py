from .unet import UNet, create_unet
from .evalnet import EvalNet, EvalNetMIoU, EvalNetMIoUV2, create_evalnet

__all__ = [
    "UNet", "create_unet",
    "EvalNet", "EvalNetMIoU", "EvalNetMIoUV2", "create_evalnet",
]
