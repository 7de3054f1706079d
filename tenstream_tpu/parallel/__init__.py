from tenstream_tpu.parallel.mesh import make_mesh, shard_fields  # noqa: F401
