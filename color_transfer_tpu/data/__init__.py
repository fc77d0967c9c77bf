from color_transfer_tpu.data import distortions, datasets

__all__ = ["distortions", "datasets"]
