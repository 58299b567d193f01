from .im_postproc import fused_im_postprocess_binary

__all__ = ["fused_im_postprocess_binary"]
