#!/usr/bin/env python3
"""TPU bit-exactness lane: run the strict kernel-vs-golden contracts on
real hardware each round (VERDICT r1 item 9 — the contract used to live
only in commit messages).

tests/conftest.py normally forces an 8-virtual-device CPU mesh; with
FRACTAL_TPU_LANE=1 it leaves the platform alone, so the
``jax.default_backend() == 'tpu'`` branches in test_golden_vs_kernel.py
assert exact integer iteration counts and bit-equal final z instead of
loose mismatch fractions, and the deep-zoom oracle tests exercise the
rebasing / floatexp / julia / ship / phoenix kernels on the chip.

Usage:  python tpu_checks.py [extra pytest args for every phase]
Exits nonzero on any strict failure; prints one JSON summary line.
"""
import json
import os
import subprocess
import sys
import time

PHASES = {
    "golden_exact": [
        "tests/test_golden_vs_kernel.py",
        "tests/test_fuzz_scenes.py::"
        "test_fuzz_random_configs_match_golden_counts"],
    "deepzoom_oracles": [
        "tests/test_deepzoom.py", "-k",
        ("rebase_matches_exact_oracle or scaled_delta_matches or "
         "deep_julia_matches or below_f64_floor or deep_ship or "
         "deep_phoenix or series_skip_scaled or stacked_aa")],
    "mandelbulb": [
        "tests/test_mandelbulb.py", "-k",
        "matches_numpy or de_step_int or noninteger or dispatch "
        "or flat_paths"],
    # the two riskiest hardware paths run on the chip every round, not
    # just in interpret mode (VERDICT r2 item 9): double-buffered orbit
    # DMA from HBM, and the giant-still band render/quantize/stream
    "hbm_orbit": [
        "tests/test_deepzoom.py", "-k",
        "hbm_orbit_streaming or rebase_with_hbm or scaled_hbm"],
    "giant_band": [
        "tests/test_parallel.py", "-k",
        ("giant_still_resume or giant_still_sharded or "
         "giant_still_mandelbulb or giant_still_deep_zoom or "
         "giant_still_supersample")],
    # the pixel-frame live display on the chip: protocol emission, the
    # planar-quantized dispatch path, and the first-frame CPU preview
    "live_gfx": ["tests/test_gfx.py"],
}


def main() -> int:
    env = dict(os.environ, FRACTAL_TPU_LANE="1")
    env.pop("JAX_PLATFORMS", None)
    cwd = os.path.dirname(os.path.abspath(__file__))
    results = {}
    rc = 0
    for name, targets in PHASES.items():
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", *targets,
             *sys.argv[1:]], env=env, cwd=cwd)
        results[name] = {"ok": proc.returncode == 0,
                         "seconds": round(time.monotonic() - t0, 1)}
        rc = rc or proc.returncode
    print(json.dumps({"lane": "tpu_exactness", "ok": rc == 0, **results}))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
