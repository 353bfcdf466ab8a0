#!/usr/bin/env python3
"""Per-query bench regression gate (round-6 tooling; full-map since round 7).

Compares two bench runs and fails (exit 1) when any query regresses by more
than RATIO x AND by more than ABS_FLOOR seconds absolute -- the floor keeps
sub-100ms queries from tripping the gate on scheduler noise, which on this
box is +/-20% run-to-run.

Default comparison source is BENCH_full.json (the complete per-query map
graft.Bench writes in the repo root every run): current working-tree file
vs the newest committed version with different content. This covers ALL
queries; the driver's BENCH_r*.json files keep only a tail of stdout, which
truncates the map (round 6: everything before q42 was invisible). Falls
back to the newest two BENCH_r*.json tails when no full history exists.

Usage:
  python3 tools/bench_gate.py                 # BENCH_full git history (or round tails)
  python3 tools/bench_gate.py OLD.json NEW.json
  python3 tools/bench_gate.py --ratio 1.5 --abs 0.3
"""
import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse_queries(data):
    if "queries" in data:
        return data["queries"]
    # driver wraps (and truncates) the bench line into {"tail": "..."}:
    # regex-scan for the per-query entries instead of parsing the line.
    text = data.get("tail", "")
    pairs = re.findall(r'"(q\d+_\w+)":(-?\d+(?:\.\d+)?)', text)
    return {name: float(t) for name, t in pairs}


def parse_sf(data):
    """The run's SF dir ('sf' field; regex fallback for driver tails).
    None when the artifact predates the field."""
    if "sf" in data:
        return data["sf"]
    m = re.search(r'"sf":"([^"]*)"', data.get("tail", ""))
    return m.group(1) if m else None


def load_queries(path):
    """(queries, sf) from one artifact — single parse, shared by every
    caller that needs both."""
    with open(path) as f:
        data = json.load(f)
    q = parse_queries(data)
    if not q:
        sys.exit(f"no per-query bench entries found in {path}")
    return q, parse_sf(data)


def full_history_pair():
    """(old_queries, new_queries, old_label, new_label) from BENCH_full.json
    working tree vs its newest committed version with different content, or
    None when there is no such pair."""
    cur_path = os.path.join(REPO, "BENCH_full.json")
    if not os.path.exists(cur_path):
        return None
    with open(cur_path) as f:
        cur_text = f.read()
    try:
        revs = subprocess.run(
            ["git", "-C", REPO, "log", "--format=%h", "--", "BENCH_full.json"],
            capture_output=True, text=True, check=True).stdout.split()
    except subprocess.CalledProcessError:
        return None
    cur_data = json.loads(cur_text)
    cur_q = parse_queries(cur_data)
    cur_sf = parse_sf(cur_data)
    if not cur_q:
        # an empty/garbled current file must FAIL the gate, not pass it
        sys.exit("BENCH_full.json has no per-query entries — bad bench run?")
    for rev in revs:
        try:
            old_text = subprocess.run(
                ["git", "-C", REPO, "show", f"{rev}:BENCH_full.json"],
                capture_output=True, text=True, check=True).stdout
            old_data = json.loads(old_text)
            old_q = parse_queries(old_data)
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue  # deletion/rename commit or garbled version: skip it
        if not old_q or old_text.strip() == cur_text.strip():
            continue
        # Bench overwrites BENCH_full.json whatever the SF dir was, so a
        # committed run at another SF would gate per-query times against a
        # mismatched baseline (bogus regressions). Keep scanning for the
        # newest committed version at the SAME sf.
        old_sf = parse_sf(old_data)
        if cur_sf is not None and old_sf is not None and old_sf != cur_sf:
            print(f"note: skipping BENCH_full.json@{rev} — sf mismatch "
                  f"({old_sf} vs current {cur_sf})")
            continue
        return (old_q, cur_q, f"BENCH_full.json@{rev}", "BENCH_full.json")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="OLD.json NEW.json")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--abs", dest="abs_floor", type=float, default=0.3)
    ap.add_argument("--force", action="store_true",
                    help="gate anyway when the two runs' SF dirs differ")
    args = ap.parse_args()

    base_old = base_new = None
    if len(args.files) == 2:
        old_path, new_path = args.files
        (old, sf_old), (new, sf_new) = load_queries(old_path), load_queries(new_path)
        base_old, base_new = os.path.basename(old_path), os.path.basename(new_path)
        if sf_old is not None and sf_new is not None and sf_old != sf_new:
            # history mode SKIPS mismatched baselines; explicit two-file
            # mode must not silently produce bogus pass/fail either —
            # refuse unless the caller forces the cross-SF comparison
            msg = (f"SF dir mismatch ({sf_old} vs {sf_new}) — per-query "
                   f"ratios are not meaningful across scale factors")
            if not args.force:
                sys.exit(f"ERROR: {msg}; pass --force to compare anyway")
            print(f"WARNING: {msg} (--force given)")
    else:
        pair = full_history_pair()
        if pair is not None:
            old, new, base_old, base_new = pair
        else:
            rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
            if len(rounds) < 2:
                sys.exit("need BENCH_full.json git history or two BENCH_r*.json rounds")
            old_path, new_path = rounds[-2], rounds[-1]
            (old, _), (new, _) = load_queries(old_path), load_queries(new_path)
            base_old = os.path.basename(old_path)
            base_new = os.path.basename(new_path)
    regressions, improvements = [], []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None or t_old <= 0 or t_new <= 0:
            continue
        if t_new > t_old * args.ratio and t_new - t_old > args.abs_floor:
            regressions.append((name, t_old, t_new))
        elif t_old > t_new * args.ratio and t_old - t_new > args.abs_floor:
            improvements.append((name, t_old, t_new))

    for name, a, b in improvements:
        print(f"IMPROVED  {name:30s} {a:7.3f}s -> {b:7.3f}s  ({a/b:.1f}x)")
    for name, a, b in regressions:
        print(f"REGRESSED {name:30s} {a:7.3f}s -> {b:7.3f}s  ({b/a:.1f}x)")
    tot_old = sum(t for t in old.values() if t > 0)
    tot_new = sum(t for t in new.values() if t > 0)
    covered = sum(1 for n, t in new.items() if t > 0 and old.get(n, 0) > 0)
    print(f"TOTAL {base_old} {tot_old:.1f}s -> {base_new} {tot_new:.1f}s; "
          f"{covered}/{len(new)} queries gated; "
          f"{len(regressions)} regression(s) at >{args.ratio}x and "
          f">{args.abs_floor}s")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
