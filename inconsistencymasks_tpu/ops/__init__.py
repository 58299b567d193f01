from . import augment, d4, im_core, losses, metrics, morphology

__all__ = ["augment", "d4", "im_core", "losses", "metrics", "morphology"]
