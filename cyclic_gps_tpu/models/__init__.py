from cyclic_gps_tpu.models import gaussians, leg

__all__ = ["gaussians", "leg"]
