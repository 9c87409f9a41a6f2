from titok_tpu.data.packing import (  # noqa: F401
    PackedBatch,
    Packer,
    pack_samples,
    unpack_videos,
)
