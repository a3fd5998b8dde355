"""Collect round-3 queue results into docs/assets/round3/ jsonl files.

Parses runs/queue_r3 logs produced by queue2.sh:
  - sudoku_eval.log  -> sudoku_acc_trajectory.jsonl
  - fid_stats.log    -> fid_stats.jsonl (per sampler/seed) + summary stats
  - cond_eval.log    -> printed verbatim
Idempotent; run any time.
"""

import json
import os
import re
import sys

Q = "runs/queue_r3"
OUT = "docs/assets/round3"


def parse_sudoku(path):
    rows, step = [], None
    for line in open(path):
        m = re.match(r"== step (\d+)", line)
        if m:
            step = int(m.group(1))
        m = re.match(r"sudoku_acc: ([0-9.]+)", line)
        if m and step is not None:
            rows.append({"step": step, "sudoku_acc": float(m.group(1)),
                         "n": 1024})
            step = None
    return rows


def parse_fid(path):
    # eval.py prints: 'FID (<kind>): <value>  [n_samples=...]'
    rows, cur = [], None
    for line in open(path):
        m = re.match(r"== sampler=(\S+) seed=(\d+)", line)
        if m:
            cur = {"sampler": m.group(1), "seed": int(m.group(2))}
        m = re.match(r"FID \(([^)]+)\): ([0-9.]+)", line)
        if m and cur is not None:
            cur["features"] = m.group(1)
            cur["fid"] = float(m.group(2))
            rows.append(cur)
            cur = None
    return rows


def main():
    os.makedirs(OUT, exist_ok=True)
    p = os.path.join(Q, "sudoku_eval.log")
    if os.path.exists(p):
        rows = parse_sudoku(p)
        with open(os.path.join(OUT, "sudoku_acc_trajectory.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print("sudoku trajectory:")
        for r in rows:
            print(f"  {r['step']:>7}: {r['sudoku_acc']:.4f}")
    p = os.path.join(Q, "fid_stats.log")
    if os.path.exists(p):
        rows = parse_fid(p)
        with open(os.path.join(OUT, "fid_stats.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print("fid stats:")
        import statistics as st

        for s in sorted({r["sampler"] for r in rows}):
            vals = [r["fid"] for r in rows if r["sampler"] == s]
            if vals:
                mean = st.mean(vals)
                sd = st.stdev(vals) if len(vals) > 1 else 0.0
                print(f"  {s}: {mean:.3f} ± {sd:.3f} (n={len(vals)}: "
                      f"{[round(v, 3) for v in vals]})")
    p = os.path.join(Q, "cond_eval.log")
    if os.path.exists(p):
        print("cond eval:")
        keep = [l.strip() for l in open(p)
                if "cond_mmd" in l or "scale_consistency" in l]
        for line in keep:
            print("  " + line)
        if keep:
            with open(os.path.join(OUT, "cond_eval.txt"), "w") as f:
                f.write("\n".join(keep) + "\n")
    p = os.path.join(Q, "d3pm_eval.log")
    if os.path.exists(p):
        print("d3pm eval:")
        keep = [l.strip() for l in open(p)
                if "mmd" in l.lower() and "warning" not in l.lower()]
        for line in keep:
            print("  " + line)
        if keep:
            with open(os.path.join(OUT, "d3pm_eval.txt"), "w") as f:
                f.write("\n".join(keep) + "\n")


if __name__ == "__main__":
    sys.exit(main())
