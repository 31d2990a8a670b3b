from cyclic_gps_tpu.data import synthetic

__all__ = ["synthetic"]
