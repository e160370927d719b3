from streamoptima_tpu.parallel.mesh import ShardedCodec, make_mesh  # noqa: F401
