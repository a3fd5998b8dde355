from ctdd_tpu.models.base import DiffusionModel, create_model  # noqa: F401
from ctdd_tpu.models import zoo as zoo  # noqa: F401
