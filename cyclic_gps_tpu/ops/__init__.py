from cyclic_gps_tpu.ops import cyclic_reduction, smallblock

__all__ = ["cyclic_reduction", "smallblock"]
