from cyclic_gps_tpu.train import loop

__all__ = ["loop"]
