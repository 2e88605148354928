"""epoch_tpu — a TPU-native particle-in-cell framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of EPOCH
(Warwick-Plasma/epoch): relativistic electromagnetic PIC with FDTD Maxwell
solvers, charge-conserving current deposition, lasers, CPML, moving window,
collisions, ionisation, QED — driven by the same input-deck language, scaled
over TPU meshes with ``jax.sharding`` instead of MPI.
"""

__version__ = "0.1.0"

from . import constants
from .deck import load_deck

__all__ = ["constants", "load_deck"]
