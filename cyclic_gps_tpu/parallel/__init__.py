from cyclic_gps_tpu.parallel import data_parallel, seq_sharded

__all__ = ["data_parallel", "seq_sharded"]
