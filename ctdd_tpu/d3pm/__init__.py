from ctdd_tpu.d3pm.diffusion import CategoricalDiffusion, make_diffusion  # noqa: F401
from ctdd_tpu.d3pm import utils as utils  # noqa: F401
