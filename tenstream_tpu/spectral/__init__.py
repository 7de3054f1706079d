from tenstream_tpu.spectral.specint import specint_pprts  # noqa: F401
