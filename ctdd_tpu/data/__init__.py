from ctdd_tpu.data.loaders import ArrayDataset, get_dataset, iterate_batches  # noqa: F401
from ctdd_tpu.data import images as images  # noqa: F401
from ctdd_tpu.data import maze as maze  # noqa: F401
from ctdd_tpu.data import protein as protein  # noqa: F401
from ctdd_tpu.data import sudoku as sudoku  # noqa: F401
from ctdd_tpu.data import synthetic as synthetic  # noqa: F401
