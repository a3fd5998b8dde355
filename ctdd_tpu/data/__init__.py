from ctdd_tpu.data.loaders import ArrayDataset, get_dataset, iterate_batches  # noqa: F401
from ctdd_tpu.data import synthetic as synthetic  # noqa: F401
