from ctdd_tpu.metrics.mmd import (  # noqa: F401
    binary_exp_hamming_mmd,
    binary_hamming_mmd,
    eval_mmd,
    exp_hamming_mmd,
    mmd_rbf,
)
from ctdd_tpu.data.maze import maze_acc  # noqa: F401
from ctdd_tpu.data.sudoku import sudoku_acc  # noqa: F401
