from ctdd_tpu.utils import math as math  # noqa: F401
