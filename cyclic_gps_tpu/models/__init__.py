from cyclic_gps_tpu.models import celerite, gaussians, leg, smk
from cyclic_gps_tpu.models.family import LEGFamily

__all__ = ["celerite", "gaussians", "leg", "smk", "LEGFamily"]
