#!/usr/bin/env python3
"""Capture BENCH_BAND.json from a quiet graft.Bench run.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
         sbt "runMain graft.Bench" 2>/dev/null | grep '"metric":"total"' \
         | python3 tools/record_band.py <round>

Reads the bench's full JSON line on stdin, writes the per-query mins as
the committed regression band. Refuses to record a run that self-reports
as loaded (warmup_calib_sec far above the quiet calibration) or that had
errors — a band captured under load would mask real regressions.

Dev tooling only — not part of the shipped library.
"""
import json
import sys

QUIET_CALIB_SEC = 6.7   # r11 quiet-machine calibration for the fixed warmup
LOADED_FACTOR = 1.8     # calib above quiet*this => machine is loaded

def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    d = json.loads(sys.stdin.read().strip().splitlines()[0])
    if d.get("errors"):
        sys.exit(f"refusing to record band: bench had errors {d['errors']}")
    calib = float(d.get("warmup_calib_sec", 0.0))
    if calib > QUIET_CALIB_SEC * LOADED_FACTOR:
        sys.exit(f"refusing to record band: warmup_calib_sec {calib:.2f} "
                 f"indicates a loaded machine (quiet ~{QUIET_CALIB_SEC})")
    mins = {k: v for k, v in sorted(d["queries"].items()) if v >= 0}
    band = {
        "recorded_at_round": rnd,
        "sf": d.get("sf", ""),
        "warmup_calib_sec": calib,
        "note": ("quiet-machine per-query min seconds at the full "
                 f"{len(mins)}-query surface; Bench flags fresh mins > band*3"),
        "mins": mins,
    }
    with open("BENCH_BAND.json", "w") as f:
        json.dump(band, f, indent=1)
    print(f"recorded {len(mins)} mins, sum {sum(mins.values()):.2f}s, "
          f"calib {calib:.2f}s")

if __name__ == "__main__":
    main()
