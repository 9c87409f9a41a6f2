from titok_tpu.models.quantizer import FSQ  # noqa: F401
