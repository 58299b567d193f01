"""inconsistencymasks_tpu — a TPU-native (JAX/Flax/Pallas) framework for
semi-supervised semantic segmentation with Inconsistency Masks.

Re-implements the full capability surface of MichaelVorndran/InconsistencyMasks
(reference layout: config.ini / paths.py / unet.py / evalnet.py / functions.py +
four datasets' numbered pipeline scripts) with a TPU-first architecture:

- Flax U-Net / EvalNet model families (reference: unet.py:46-67, evalnet.py:24-106)
- Population training: the reference trains 5-10 candidate models serially
  (e.g. ISIC_2018/03_ISIC_2018_subset.py:48-79); here candidates train
  SIMULTANEOUSLY as a vmapped leading "population" axis, data-parallel over a
  jax.sharding.Mesh.
- Fused pseudo-label generation: K-model batched inference -> threshold/argmax
  -> XOR disagreement (the Inconsistency Mask) -> morphology -> gray-out runs
  as ONE XLA program (reference: functions.py:2832-3238 does this per-image on
  host with cv2/NumPy).
- On-device D4 TTA, augmentation, IoU/Dice metrics, EvalNet scoring.

The external contract of the reference is preserved: same config.ini format,
same directory layout (paths.py), same numbered zero-arg CLI scripts, same
results_*.csv / mean_im_size_*.csv outputs, same `{model}_topK_{i}` checkpoint
naming protocol.
"""

__version__ = "0.1.0"
