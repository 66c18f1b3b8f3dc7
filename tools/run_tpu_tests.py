"""Run the TPU test tier and record the evidence as a JSON artifact.

The TPU tier (``@pytest.mark.tpu``: Mosaic-compiled kernels, golden
conformance on hardware, the 500-launch soak) is green-or-not on the real
chip only; this runner turns that status into a committed per-round
artifact (``TPUTESTS_r<N>.json``) so the claim is checkable, mirroring how
``bench.py`` -> ``BENCH_r<N>.json`` records performance (VERDICT round 4,
item 7).

Usage (from /root/repo, PYTHONPATH untouched — see
.claude/skills/verify/SKILL.md for why):

    python tools/run_tpu_tests.py --out TPUTESTS_r05.json

Exit status is pytest's, so CI can gate on it.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time


def run(out_path: str | None, extra: list[str]) -> int:
    env = dict(os.environ)
    env["TPU_SDR_TEST_PLATFORM"] = "tpu"
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q",
           "--no-header"] + extra
    t0 = time.time()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    duration = round(time.time() - t0, 1)
    tail = proc.stdout.strip().splitlines()[-15:]
    print("\n".join(tail))

    counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    # pytest summary line, e.g. "37 passed, 234 skipped in 512.31s"
    summary = ""
    for line in reversed(proc.stdout.splitlines()):
        if re.search(r"\b(passed|failed|skipped|error)", line) and " in " in line:
            summary = line.strip().strip("= ")
            break
    for key in counts:
        m = re.search(rf"(\d+) {key.rstrip('s')}", summary)
        if m:
            counts[key] = int(m.group(1))

    record = {
        "metric": "tpu_tier_tests",
        **counts,
        "duration_s": duration,
        "rc": proc.returncode,
        "summary": summary,
        "backend": _backend(),
        "cmd": " ".join(cmd[2:]),
    }
    line = json.dumps(record)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return proc.returncode


def _backend() -> str:
    try:
        import jax

        return str(jax.devices()[0])
    except Exception as e:  # pragma: no cover - env-dependent
        return f"unavailable: {e}"


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default=None,
                   help="write the one-line JSON artifact here")
    p.add_argument("extra", nargs="*",
                   help="extra pytest args (e.g. -k soak)")
    args = p.parse_args(argv)
    return run(args.out, args.extra)


if __name__ == "__main__":
    sys.exit(main())
