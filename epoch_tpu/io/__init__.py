from . import sdf
from .diagnostics import OutputManager

__all__ = ["sdf", "OutputManager"]
