from .trainer import train, evaluate, infer, restore_state
from .checkpoint import CheckpointManager
