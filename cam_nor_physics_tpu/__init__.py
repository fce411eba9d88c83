"""cam_nor_physics_tpu — TPU-native atmosphere framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the capabilities of
NorESMhub/CAM-Nor-physics (Lin-Rood FV dycore + NorESM column physics).
See SURVEY.md at the repo root for the structural map of the reference and
the design decisions taken here.
"""

__version__ = "0.1.0"
