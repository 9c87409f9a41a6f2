from titok_tpu.parallel.mesh import make_mesh  # noqa: F401
