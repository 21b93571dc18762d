from ganspace_tpu.utils.imaging import pad_frames, prettify_name, to_uint8

__all__ = ["pad_frames", "prettify_name", "to_uint8"]
