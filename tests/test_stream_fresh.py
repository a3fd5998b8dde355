"""Fresh-pool streaming (MazePoolDataset.regenerate + loop wiring).

The reference's maze dataset generates a fresh maze per __getitem__
(maze.py:945-966); long runs over a finite pre-generated pool measurably
degrade sample exactness (500k run: 45% @ 12k -> 6.5% @ 500k maze_acc).
stream_fresh swaps in a regenerated pool every epoch, keyed by the
absolute epoch index so preemption/resume replays the same stream.
"""

import numpy as np

from ctdd_tpu.config.presets import get_preset
from ctdd_tpu.data.loaders import get_dataset
from ctdd_tpu.data.maze import MazePoolDataset
from ctdd_tpu.data.sudoku import SudokuPoolDataset, sudoku_acc


def test_regenerate_changes_and_is_deterministic():
    ds = MazePoolDataset(16, random_transform=True, seed=0)
    first = ds.data.copy()
    second = ds.regenerate(1)
    assert second.shape == first.shape
    assert second.dtype == first.dtype
    assert not np.array_equal(second, first)
    # same seed -> identical pool (resume replays the stream)
    again = MazePoolDataset(16, random_transform=True, seed=0).regenerate(1)
    np.testing.assert_array_equal(again, second)
    # pool 0 equals the constructor pool (epoch 0 is the initial pool)
    np.testing.assert_array_equal(ds.regenerate(0), first)


def test_pool_seed_mixing_no_collisions():
    """Epoch keys must mix in the base seed: with data.seed=k, epoch k must
    NOT replay the initial pool, and different base seeds must diverge."""
    ds3 = MazePoolDataset(8, random_transform=True, seed=3)
    initial = ds3.data.copy()
    assert not np.array_equal(ds3.regenerate(3), initial)
    a = MazePoolDataset(8, random_transform=True, seed=0).regenerate(1)
    b = MazePoolDataset(8, random_transform=True, seed=1).regenerate(1)
    assert not np.array_equal(a, b)


def test_sudoku_pool_regenerates_valid_boards():
    ds = SudokuPoolDataset(8, seed=0)
    first = ds.data.copy()
    assert first.shape == (8, 81)
    assert sudoku_acc(first) == 1.0  # generator emits solved boards
    second = ds.regenerate(1)
    assert not np.array_equal(second, first)
    assert sudoku_acc(second) == 1.0
    again = SudokuPoolDataset(8, seed=0).regenerate(1)
    np.testing.assert_array_equal(again, second)
    np.testing.assert_array_equal(ds.regenerate(0), first)


def test_sudoku_preset_enables_stream_fresh():
    cfg = get_preset("sudoku")
    assert cfg.data.get("stream_fresh", False)
    cfg.data.num_samples = 8
    ds = get_dataset(cfg)
    assert hasattr(ds, "regenerate")


def test_maze_presets_enable_stream_fresh():
    for name in ("tauUnet_maze", "hollow_maze", "bert_maze", "protein_maze",
                 "protein_maze_d3pm", "bert_mazemasked", "hollow_maze_distr"):
        cfg = get_preset(name)
        assert cfg.data.get("stream_fresh", False), name
        ds = get_dataset(cfg)
        assert hasattr(ds, "regenerate"), name


def test_train_loop_refreshes_pool(tmp_path):
    """Two epochs of a shrunken maze run: the loop must call regenerate at
    the epoch boundary (observed via a counting subclass)."""
    from ctdd_tpu.training.loop import train

    cfg = get_preset("tauUnet_maze")
    cfg.save_location = str(tmp_path)
    cfg.data.num_samples = 64
    cfg.data.batch_size = 32  # steps_per_epoch = 2
    cfg.model.ch = 8
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = [1, 2]
    cfg.sampler.sample_freq = 0
    cfg.saving.checkpoint_freq = 100

    calls = []
    orig = MazePoolDataset.regenerate

    def spy(self, seed):
        calls.append(seed)
        return orig(self, seed)

    MazePoolDataset.regenerate = spy
    try:
        train(cfg, n_iters=5, writer_kind="dummy")
    finally:
        MazePoolDataset.regenerate = orig
    # epoch boundaries at it=2 and it=4 -> epochs 1 and 2
    assert calls == [1, 2], calls


def test_train_loop_async_period_refresh(tmp_path):
    """stream_refresh_period > 1 swaps pools at period boundaries via the
    async prefetch thread, keyed by the snapped epoch index."""
    from ctdd_tpu.training.loop import train

    cfg = get_preset("tauUnet_maze")
    cfg.save_location = str(tmp_path)
    cfg.data.num_samples = 64
    cfg.data.batch_size = 32  # steps_per_epoch = 2
    cfg.data.stream_refresh_period = 2  # steps_per_pool = 4
    cfg.model.ch = 8
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = [1, 2]
    cfg.sampler.sample_freq = 0
    cfg.saving.checkpoint_freq = 100

    calls = []
    orig = MazePoolDataset.regenerate

    def spy(self, epoch):
        calls.append(epoch)
        return orig(self, epoch)

    MazePoolDataset.regenerate = spy
    try:
        train(cfg, n_iters=9, writer_kind="dummy")
    finally:
        MazePoolDataset.regenerate = orig
    # pool boundaries at it=4 and it=8 -> snapped epochs 2 and 4,
    # generated ahead by the prefetch thread
    assert calls == [2, 4], calls


def test_train_loop_rekeys_pool_on_resume(tmp_path):
    """A resumed run must rebuild the pool for its restart epoch instead of
    training on the constructor (epoch-0) pool until the next boundary."""
    from ctdd_tpu.training.loop import train

    cfg = get_preset("tauUnet_maze")
    cfg.save_location = str(tmp_path)
    cfg.data.num_samples = 64
    cfg.data.batch_size = 32  # steps_per_epoch = 2
    cfg.model.ch = 8
    cfg.model.num_res_blocks = 1
    cfg.model.ch_mult = [1, 2]
    cfg.sampler.sample_freq = 0
    cfg.saving.checkpoint_freq = 100

    _, out = train(cfg, n_iters=5, writer_kind="dummy")
    ckpt_dir = out["paths"]["checkpoints"]

    calls = []
    orig = MazePoolDataset.regenerate

    def spy(self, epoch):
        calls.append(epoch)
        return orig(self, epoch)

    MazePoolDataset.regenerate = spy
    try:
        train(cfg, n_iters=9, writer_kind="dummy", resume_from=ckpt_dir)
    finally:
        MazePoolDataset.regenerate = orig
    # restart at it=5 -> pre-loop re-key for epoch 2, then boundaries at
    # it=6 and it=8 -> epochs 3 and 4
    assert calls == [2, 3, 4], calls
