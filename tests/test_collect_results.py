"""collect_round3_results parse functions: pure-python log scraping.

These parsers turn unattended queue logs into committed evidence jsonl;
a silent format drift would lose a night of TPU results, so pin them.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "collect_round3_results",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "collect_round3_results.py"),
)
collect = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(collect)


def test_parse_sudoku_pairs_steps_with_acc(tmp_path):
    p = tmp_path / "sudoku_eval.log"
    p.write_text(
        "== step 50000 (ema)\n"
        "noise line\n"
        "sudoku_acc: 0.171875  [n=1024]\n"
        "== step 100000 (ema)\n"
        "sudoku_acc: 0.189453\n"
        "sudoku_acc: 0.5\n"  # orphan (no preceding step) — dropped
    )
    rows = collect.parse_sudoku(str(p))
    assert rows == [
        {"step": 50000, "sudoku_acc": 0.171875, "n": 1024},
        {"step": 100000, "sudoku_acc": 0.189453, "n": 1024},
    ]


def test_parse_fid_attaches_header_fields(tmp_path):
    p = tmp_path / "fid_stats.log"
    p.write_text(
        "== sampler=MidPointTauL seed=0\n"
        "FID (trained): 2.6512  [n_samples=4096]\n"
        "== sampler=TauL seed=1\n"
        "warning: something unrelated\n"
        "FID (trained): 2.9001\n"
        "FID (trained): 9.9\n"  # no fresh header — dropped
    )
    rows = collect.parse_fid(str(p))
    assert rows == [
        {"sampler": "MidPointTauL", "seed": 0, "features": "trained",
         "fid": 2.6512},
        {"sampler": "TauL", "seed": 1, "features": "trained", "fid": 2.9001},
    ]
