from titok_tpu.ops.patchify import patchify, unpatchify  # noqa: F401
