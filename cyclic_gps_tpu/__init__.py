"""cyclic_gps_tpu: TPU-native linear-time Gaussian-process inference.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cunningham-lab/cyclic-gps: LEG (Latent Exponentially Generated) Gaussian
processes on 1-D inputs, with all expensive operations reduced to
branch-free block-tridiagonal solvers (cyclic reduction and a partitioned
block-Thomas engine).
"""

from cyclic_gps_tpu.ops import cyclic_reduction, expm_em, partitioned, smallblock

__version__ = "0.1.0"

__all__ = [
    "cyclic_reduction",
    "expm_em",
    "partitioned",
    "smallblock",
    "__version__",
]
