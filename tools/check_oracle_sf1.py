#!/usr/bin/env python3
"""Per-query timeout driver for check_oracle.py at large scale factors.

Some oracles are intentionally non-polynomial (all-pairs brute force is the
POINT of an oracle for a dedup candidate generator), which is fine at
sf0.01/sf0.1 but not at sf1.0-class fixtures. This driver runs each query's
oracle compare in its own subprocess with a wall-clock budget and tallies
OK / FAIL / TIMEOUT(skipped-nonpoly) / NO-ORACLE.

Usage: python3 tools/check_oracle_sf1.py <sfDir> <outDir> [timeoutSec=180]
"""
import glob
import json
import os
import subprocess
import sys


def main(sf_dir, out_dir, budget):
    names = sorted(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(p))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok, fail, timeout, noracle = [], [], [], []
    for name in names:
        if name not in oracle:
            noracle.append(name)
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=budget)
            line = [l for l in r.stdout.splitlines() if l.startswith(("OK", "FAIL"))]
            if r.returncode == 0:
                ok.append(name)
                print(line[0] if line else f"OK   {name}")
            else:
                fail.append(name)
                print("\n".join(l for l in r.stdout.splitlines() if "FAIL" in l) or f"FAIL {name}")
        except subprocess.TimeoutExpired:
            timeout.append(name)
            print(f"TIMEOUT {name} (> {budget}s — recorded as non-poly oracle at this SF)")
        sys.stdout.flush()
    print(f"\nOK={len(ok)} FAIL={len(fail)} TIMEOUT={len(timeout)} NO-ORACLE={len(noracle)}")
    if fail:
        print("FAILED:", ",".join(fail))
    if timeout:
        print("TIMED-OUT:", ",".join(timeout))
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 180))
