#!/usr/bin/env python3
"""Per-query bench regression gate (round-6 tooling).

Compares the newest two BENCH_r*.json files in the repo root (or two files
given explicitly) and fails (exit 1) when any query regresses by more than
RATIO x AND by more than ABS_FLOOR seconds absolute -- the floor keeps
sub-100ms queries from tripping the gate on scheduler noise, which on this
box is +/-20% run-to-run.

Usage:
  python3 tools/bench_gate.py                 # newest two rounds
  python3 tools/bench_gate.py OLD.json NEW.json
  python3 tools/bench_gate.py --ratio 1.5 --abs 0.3
"""
import argparse
import glob
import json
import os
import re
import sys


def load_queries(path):
    with open(path) as f:
        data = json.load(f)
    if "queries" in data:
        return data["queries"]
    # driver wraps (and truncates) the bench line into {"tail": "..."}:
    # regex-scan for the per-query entries instead of parsing the line.
    text = data.get("tail", "")
    pairs = re.findall(r'"(q\d+_\w+)":(-?\d+(?:\.\d+)?)', text)
    if not pairs:
        sys.exit(f"no per-query bench entries found in {path}")
    return {name: float(t) for name, t in pairs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="OLD.json NEW.json")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--abs", dest="abs_floor", type=float, default=0.3)
    args = ap.parse_args()

    if len(args.files) == 2:
        old_path, new_path = args.files
    else:
        rounds = sorted(glob.glob(os.path.join(
            os.path.dirname(__file__), "..", "BENCH_r*.json")))
        if len(rounds) < 2:
            sys.exit("need at least two BENCH_r*.json rounds")
        old_path, new_path = rounds[-2], rounds[-1]

    old, new = load_queries(old_path), load_queries(new_path)
    regressions, improvements = [], []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        if t_new > t_old * args.ratio and t_new - t_old > args.abs_floor:
            regressions.append((name, t_old, t_new))
        elif t_old > t_new * args.ratio and t_old - t_new > args.abs_floor:
            improvements.append((name, t_old, t_new))

    base_old = os.path.basename(old_path)
    base_new = os.path.basename(new_path)
    for name, a, b in improvements:
        print(f"IMPROVED  {name:30s} {a:7.3f}s -> {b:7.3f}s  ({a/b:.1f}x)")
    for name, a, b in regressions:
        print(f"REGRESSED {name:30s} {a:7.3f}s -> {b:7.3f}s  ({b/a:.1f}x)")
    tot_old = sum(t for t in old.values() if t > 0)
    tot_new = sum(t for t in new.values() if t > 0)
    print(f"TOTAL {base_old} {tot_old:.1f}s -> {base_new} {tot_new:.1f}s; "
          f"{len(regressions)} regression(s) at >{args.ratio}x and "
          f">{args.abs_floor}s")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
