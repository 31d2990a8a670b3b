from cyclic_gps_tpu.ops import (
    cyclic_reduction,
    expm_em,
    partitioned,
    smallblock,
)

__all__ = ["cyclic_reduction", "expm_em", "partitioned", "smallblock"]
