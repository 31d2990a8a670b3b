from cyclic_gps_tpu.models import gaussians, leg, smk
from cyclic_gps_tpu.models.family import LEGFamily

__all__ = ["gaussians", "leg", "smk", "LEGFamily"]
