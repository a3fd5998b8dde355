from ctdd_tpu.config.base import FrozenCfg, load_config, save_config  # noqa: F401
from ctdd_tpu.config.presets import get_preset, preset_names  # noqa: F401
