from .optim import adamw_decoupled
from .trainer import Monitor, PopulationTrainer
from .checkpoint import load_variables, save_variables, stack_variables, unstack_variables
from .keras_import import (export_unet_variables_to_keras_h5,
                           keras_h5_to_unet_variables)

__all__ = [
    "adamw_decoupled", "Monitor", "PopulationTrainer",
    "load_variables", "save_variables", "stack_variables", "unstack_variables",
    "export_unet_variables_to_keras_h5", "keras_h5_to_unet_variables",
]
