from tenstream_tpu.optprop.lut import LUT, LUTAxes, load_or_create_lut, mockup_axes  # noqa: F401
from tenstream_tpu.optprop.facade import OptProp  # noqa: F401
