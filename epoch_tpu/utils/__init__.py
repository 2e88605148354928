from .timers import Timers

__all__ = ["Timers"]
