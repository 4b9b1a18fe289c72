from unet_design_tpu.models.registry import MODEL_REGISTRY, COND_MODEL_REGISTRY, build_model  # noqa: F401
