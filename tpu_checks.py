#!/usr/bin/env python3
"""TPU bit-exactness lane: run the strict kernel-vs-golden contract on real
hardware each round (VERDICT r1 item 9 — the contract used to live only in
commit messages).

tests/conftest.py normally forces an 8-virtual-device CPU mesh; with
FRACTAL_TPU_LANE=1 it leaves the platform alone, so the
``jax.default_backend() == 'tpu'`` branches in test_golden_vs_kernel.py
assert exact integer iteration counts and bit-equal final z instead of
loose mismatch fractions.

Usage:  python tpu_checks.py [extra pytest args]
Exits nonzero on any strict failure; prints one JSON summary line.
"""
import json
import os
import subprocess
import sys
import time

TARGETS = ["tests/test_golden_vs_kernel.py"]


def main() -> int:
    env = dict(os.environ, FRACTAL_TPU_LANE="1")
    env.pop("JAX_PLATFORMS", None)
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *TARGETS, *sys.argv[1:]],
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)))
    dt = time.monotonic() - t0
    print(json.dumps({"lane": "tpu_exactness", "ok": proc.returncode == 0,
                      "seconds": round(dt, 1)}))
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
