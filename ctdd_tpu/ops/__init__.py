from ctdd_tpu.ops import indexing as indexing  # noqa: F401
from ctdd_tpu.ops.forward_process import (  # noqa: F401
    ForwardProcess,
    build_process,
)
