from .labels import (compute_classwise_confluence, compute_classwise_detection,
                     compute_classwise_detection_im, compute_classwise_iou,
                     get_confluence_binary)
from .datagen import (create_training_data_evalnet_binary,
                      create_training_data_evalnet_im_binary,
                      create_training_data_evalnet_im_multiclass,
                      create_training_data_evalnet_miou_hela,
                      create_training_data_evalnet_miou_im_hela,
                      create_training_data_evalnet_miou_im_multiclass,
                      create_training_data_evalnet_multiclass)
from .dataset import (load_evalnet_dataset_binary, load_evalnet_dataset_hela,
                      load_evalnet_dataset_multiclass)
from .trainer import EvalNetTrainer
from .filtering import (create_training_data_for_segnet_binary,
                        create_training_data_for_segnet_miou_hela,
                        create_training_data_for_segnet_miou_multiclass)
from .adaptive_aug import (create_augment_images_and_masks_with_evalnet_binary,
                           create_augment_images_and_masks_with_evalnet_multiclass,
                           create_augment_images_and_masks_with_gt)

__all__ = [
    "compute_classwise_confluence", "compute_classwise_detection",
    "compute_classwise_detection_im", "compute_classwise_iou",
    "get_confluence_binary",
    "create_training_data_evalnet_binary",
    "create_training_data_evalnet_im_binary",
    "create_training_data_evalnet_im_multiclass",
    "create_training_data_evalnet_miou_hela",
    "create_training_data_evalnet_miou_im_hela",
    "create_training_data_evalnet_miou_im_multiclass",
    "create_training_data_evalnet_multiclass",
    "load_evalnet_dataset_binary", "load_evalnet_dataset_hela",
    "load_evalnet_dataset_multiclass",
    "EvalNetTrainer",
    "create_training_data_for_segnet_binary",
    "create_training_data_for_segnet_miou_hela",
    "create_training_data_for_segnet_miou_multiclass",
    "create_augment_images_and_masks_with_evalnet_binary",
    "create_augment_images_and_masks_with_evalnet_multiclass",
    "create_augment_images_and_masks_with_gt",
]
