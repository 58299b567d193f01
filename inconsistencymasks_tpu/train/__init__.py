from .optim import adamw_decoupled
from .trainer import Monitor, PopulationTrainer
from .checkpoint import load_variables, save_variables, stack_variables, unstack_variables

__all__ = [
    "adamw_decoupled", "Monitor", "PopulationTrainer",
    "load_variables", "save_variables", "stack_variables", "unstack_variables",
]
