from . import losses, optim
from .trainer import Trainer, build_models, init_variables

__all__ = ["losses", "optim", "Trainer", "build_models", "init_variables"]
