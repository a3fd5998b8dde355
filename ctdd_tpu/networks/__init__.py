from ctdd_tpu.networks import common as common  # noqa: F401
from ctdd_tpu.networks import mlp as mlp  # noqa: F401
from ctdd_tpu.networks import transformer as transformer  # noqa: F401
