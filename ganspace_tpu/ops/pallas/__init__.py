from ganspace_tpu.ops.pallas.moments import centered_gram

__all__ = ["centered_gram"]
