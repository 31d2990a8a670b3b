from cyclic_gps_tpu.baselines import dense, kalman

__all__ = ["dense", "kalman"]
