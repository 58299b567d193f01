from .engine import StackedEnsemble
from .im import (create_pseudo_labels_im_binary, create_pseudo_labels_im_hela,
                 create_pseudo_labels_im_multiclass)
from .ensemble import (create_pseudo_labels_model_ensemble_binary,
                       create_pseudo_labels_model_ensemble_hela,
                       create_pseudo_labels_model_ensemble_multiclass)
from .input_ensemble import (create_pseudo_labels_input_ensemble_binary,
                             create_pseudo_labels_input_ensemble_hela,
                             create_pseudo_labels_input_ensemble_multiclass)
from .noisy_student import (create_pseudo_labels_noisy_student_binary,
                            create_pseudo_labels_noisy_student_hela,
                            create_pseudo_labels_noisy_student_multiclass)

__all__ = [
    "StackedEnsemble",
    "create_pseudo_labels_im_binary", "create_pseudo_labels_im_hela",
    "create_pseudo_labels_im_multiclass",
    "create_pseudo_labels_model_ensemble_binary",
    "create_pseudo_labels_model_ensemble_hela",
    "create_pseudo_labels_model_ensemble_multiclass",
    "create_pseudo_labels_input_ensemble_binary",
    "create_pseudo_labels_input_ensemble_hela",
    "create_pseudo_labels_input_ensemble_multiclass",
    "create_pseudo_labels_noisy_student_binary",
    "create_pseudo_labels_noisy_student_hela",
    "create_pseudo_labels_noisy_student_multiclass",
]
