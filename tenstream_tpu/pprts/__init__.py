from tenstream_tpu.pprts.solver import PprtsSolver  # noqa: F401
