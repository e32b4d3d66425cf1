from . import loop, state, step  # noqa: F401
from .loop import Trainer  # noqa: F401
