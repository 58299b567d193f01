from .im_postproc import (fused_im_postprocess_binary,
                          fused_im_postprocess_hela,
                          fused_im_postprocess_multiclass)

__all__ = ["fused_im_postprocess_binary", "fused_im_postprocess_hela",
           "fused_im_postprocess_multiclass"]
