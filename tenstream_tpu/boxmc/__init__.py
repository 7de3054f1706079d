from tenstream_tpu.boxmc.tracer import run_boxmc  # noqa: F401
