from unet_design_tpu.ops import wavelet  # noqa: F401
