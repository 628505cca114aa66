"""Benchmark: BASELINE config #1 — Mandelbrot 1920x1080, default viewport,
256 max-iter, smooth coloring ("PNG out": the full device export pipeline
— escape kernel, fused coloring + post chain, and the PNG writer's uint8
quantization, i.e. what render/animate execute per exported frame).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Target: >= 1 Gpixel/s/chip (BASELINE.md) → vs_baseline = Mpix/s / 1000.

Timing method: K frames are rendered inside one jitted device-side loop
(distinct zooms, each frame consumed by a uint8 accumulate to defeat CSE)
and per-frame time comes from a jax.profiler device trace ('XLA Modules'
lane = on-device program wall-clock, immune to the tunneled link's
host-timing variance), falling back to best-of-3 amortized (T(K) - T(1))
wall-clock deltas when tracing is unavailable.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _failure_record(msg: str) -> dict:
    """The zero-value bench record emitted when the device is wedged,
    annotated with the last recorded healthy number for the reader."""
    import glob
    import os
    import re

    rec = {
        "metric": "mandelbrot_1080p_256iter_render", "value": 0.0,
        "unit": "Mpix/s/chip", "vs_baseline": 0.0, "error": msg}
    try:
        prior = sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_r*.json")))
        for path in reversed(prior):
            last = json.load(open(path)).get("parsed") or {}
            if last.get("value"):
                rec["last_good"] = {
                    "round": int(re.search(r"r(\d+)", path).group(1)),
                    "value": last["value"], "unit": last.get("unit")}
                break
    except Exception:
        pass
    return rec


def _preflight_ok(timeout_s: int = 300) -> bool:
    """Probe the device in a SUBPROCESS before committing to the run: a
    wedged tunnel blocks make_c_api_client itself (first jax.devices() of
    a fresh process, observed 2026-08-17), so a failed probe means the
    main process would hang for the full watchdog window.  The child
    self-exits via faulthandler's C-level watchdog (works even with the
    GIL held); the op is a trivial device_put+sum so an interrupted probe
    never leaves meaningful in-flight device work."""
    import subprocess
    import sys

    code = ("import faulthandler\n"
            f"faulthandler.dump_traceback_later({timeout_s - 10}, "
            "exit=True)\n"
            "import jax, jax.numpy as jnp\n"
            "print(float((jax.device_put(jnp.arange(4.0)) + 1).sum()))\n")
    # Three attempts at a generous bound: healthy-tunnel client creation
    # has been observed anywhere from 9 s to 138 s within one hour
    # (2026-08-18), so a tight single probe is indistinguishable from a
    # wedge.  A genuinely wedged link fails all three in ~15 min — still
    # under the 30-min watchdog it exists to avoid, and a wedge is the
    # rare case; the slow-but-healthy case must never record a 0.
    for _ in range(3):
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if p.returncode == 0:
                return True
        except (subprocess.TimeoutExpired, OSError):
            pass
    return False


# Filled in as main() measures each workload; the watchdog emits it if a
# LATER row wedges — a hung extra row must not zero an already-measured
# headline.
_PARTIAL: dict = {}


def _install_watchdog(seconds: int = 1800) -> None:
    """The tunneled device can wedge (client creation or any execution
    blocks forever inside a PJRT C call); emit a failure record instead
    of hanging the driver.  30 min covers the worst observed
    cold-compile total.

    Must NOT rely on signals: the main thread is stuck in C and never
    re-enters the interpreter, so a Python SIGALRM handler would never
    run (observed during the 2026-08-17 outage).  A daemon thread works
    whenever the blocked call releases the GIL (PJRT calls do); a
    faulthandler timer backstops the GIL-held case (its watchdog thread
    is pure C and exits without needing the interpreter at all)."""
    import faulthandler
    import os
    import threading

    def bail():
        if "value" in _PARTIAL:  # measured, even if it rounded to 0.0
            # the headline was measured — report it, noting which extra
            # row wedged instead of recording a zero
            rec = dict(_PARTIAL)
            rec["warning"] = (f"watchdog fired after {seconds}s while "
                              "measuring an extra row; partial record")
            print(json.dumps(rec), flush=True)
            os._exit(0)
        rec = _failure_record(
            f"device unresponsive for {seconds}s "
            "(watchdog; see BENCH history for real numbers)")
        print(json.dumps(rec), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, bail)
    t.daemon = True
    t.start()
    try:  # GIL-held backstop: C-level exit, 60 s after the JSON path
        faulthandler.dump_traceback_later(seconds + 60, exit=True)
    except (ValueError, OSError, RuntimeError):
        pass


def main() -> None:
    if not _preflight_ok():
        print(json.dumps(_failure_record(
            "device preflight failed (PJRT client creation or a trivial "
            "op blocked >300s in 3 probe subprocesses; see BENCH history "
            "for real numbers)")), flush=True)
        raise SystemExit(3)
    _install_watchdog()
    from fractalrenderer_tpu.models import common
    from fractalrenderer_tpu.scene import Scene

    W, H, ITERS = 1920, 1080, 256
    scene = Scene(max_iterations=ITERS)
    cfg = common.scene_static_cfg(scene, W, H, "mandelbrot", "centered",
                                  False)
    base = {k: jnp.float32(v)
            for k, v in common.scene_dyn_params(scene).items()}

    # Timed pipeline: the quantized-export path (kernel + fused coloring +
    # post chain + the PNG writer's uint8 quantization, all on device) —
    # exactly what render/animate execute per exported frame.  Frames are
    # consumed by a wrapping uint8 accumulate (18 MB of traffic vs 75 MB
    # for an f32 (H,W,3) sum), so the harness tax on the measured number
    # is minimal without letting XLA elide any frame.
    assert common.planar_export_ok(cfg)
    band = common.band_render_fn(cfg, H, H, planar_quantize=8)

    @jax.jit
    def f(dyn, k_frames):
        def body(k, acc):
            d = dict(dyn)
            d["zoom"] = dyn["zoom"] + k.astype(jnp.float32) * 1e-6
            return acc + band(d, jnp.float32(0.0))
        # dynamic bound → ONE compile serves every K (the compile service
        # behind the tunneled device has minutes-scale latency swings)
        return jax.lax.fori_loop(
            0, k_frames, body, jnp.zeros((3, H, W), jnp.uint8))

    def run(K):
        out = f(base, jnp.int32(K))
        t0 = time.perf_counter()
        float(out[0, 0, 0])  # forces execution + completion
        return time.perf_counter() - t0

    K = 64
    run(1)          # compile + warm
    # Preferred timing: jax.profiler device trace — the 'XLA Modules' lane
    # records on-device program wall-clock, immune to the tunneled link's
    # ±2x host-timing variance.  Falls back to best-of-3 amortized
    # wall-clock deltas if tracing is unavailable.
    method = "profiler_trace"
    try:
        from fractalrenderer_tpu.utils.diag import measure_device_seconds

        per_frame = min(
            measure_device_seconds(lambda: run(K)) / K for _ in range(2))
        if per_frame <= 0:
            raise RuntimeError("empty device trace")
    except Exception:
        method = "amortized_wall"
        per_frame = min(
            max((run(K) - run(1)) / (K - 1), 1e-9) for _ in range(3))
    mpix_s = W * H / per_frame / 1e6
    _PARTIAL.update({
        "metric": "mandelbrot_1080p_256iter_render",
        "value": round(mpix_s, 1), "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / 1000.0, 3),
        "timing_method": method})

    # iterations/sec (BASELINE.json's second metric): actual escape-loop
    # work divided by frame time — mean iteration count over this exact
    # viewport times pixel throughput.
    from fractalrenderer_tpu.ops.escape import escape_fields

    n = escape_fields("mandelbrot", W, H, center_x=scene.center_x,
                      center_y=scene.center_y, zoom=scene.zoom,
                      max_iter=ITERS)["n"]
    mean_iters = float(jnp.mean(n.astype(jnp.float32)))
    iters_s = mpix_s * 1e6 * mean_iters
    _PARTIAL.update({"iters_per_sec": round(iters_s, 0),
                     "mean_iters_per_pixel": round(mean_iters, 2)})

    # Mandelbulb 1080p device time (3D path regression guard; the bulb's
    # trig-free DE + fused shading regressed silently once in round 1).
    bulb_ms = None
    try:
        from fractalrenderer_tpu.models import mandelbulb
        from fractalrenderer_tpu.scene import FractalType

        bscene = Scene(fractal_type=FractalType.MANDELBULB,
                       max_iterations=100)
        bp = mandelbulb._bulb_params(bscene)
        bfn = mandelbulb._compiled(W, H, bp.max_iterations, bp.palette_mode,
                                   bp.aa_samples,
                                   mandelbulb._static_int_power(bp))
        dyn = {k: getattr(bp, k) for k in mandelbulb._DYN_FIELDS}

        def brun():
            out = bfn(dyn)
            t0 = time.perf_counter()
            float(out[0, 0, 0])
            return time.perf_counter() - t0

        brun()  # compile + warm
        try:
            from fractalrenderer_tpu.utils.diag import \
                measure_device_seconds

            bulb_s = min(measure_device_seconds(brun) for _ in range(2))
            if bulb_s <= 0:
                raise RuntimeError("empty trace")
        except Exception:
            bulb_s = min(brun() for _ in range(3))
        bulb_ms = round(bulb_s * 1e3, 1)
        _PARTIAL.update({
            "mandelbulb_1080p_ms": bulb_ms,
            "mandelbulb_mpix_s": round(W * H / (bulb_ms / 1e3) / 1e6, 1)})
    except Exception:
        pass

    # Julia c-sweep row (BASELINE config #2 shape: 16 c-values per batch
    # through the quantized-export pipeline) — a regression in the batch /
    # fused-coloring path shows here even when the headline is healthy.
    julia_row = None
    try:
        from fractalrenderer_tpu.scene import FractalType

        B = 16
        sj = Scene(fractal_type=FractalType.JULIA, max_iterations=ITERS,
                   zoom=3.0)
        cfgj = common.scene_static_cfg(sj, W, H, "julia", "uv", True)
        basej = {k: jnp.float32(v)
                 for k, v in common.scene_dyn_params(sj).items()}
        bandj = common.band_render_fn(cfgj, H, H, planar_quantize=8)
        c_re = jnp.linspace(-0.9, -0.6, B)
        c_im = jnp.linspace(0.1, 0.3, B)

        @jax.jit
        def fj(dyn, n_batches):
            def batch(k, acc):
                def frame(i, acc2):
                    d = dict(dyn)
                    d["julia_c_real"] = (c_re[i]
                                         + k.astype(jnp.float32) * 1e-6)
                    d["julia_c_imag"] = c_im[i]
                    return acc2 + bandj(d, jnp.float32(0.0))
                return jax.lax.fori_loop(0, B, frame, acc)
            return jax.lax.fori_loop(0, n_batches, batch,
                                     jnp.zeros((3, H, W), jnp.uint8))

        def jrun(K):
            o = fj(basej, jnp.int32(K))
            t0 = time.perf_counter()
            float(o[0, 0, 0])
            return time.perf_counter() - t0

        jrun(1)  # compile + warm
        try:
            from fractalrenderer_tpu.utils.diag import \
                measure_device_seconds as _mds

            per_b = min(_mds(lambda: jrun(4)) / 4 for _ in range(2))
            if per_b <= 0:
                raise RuntimeError("empty trace")
            jmethod = "profiler_trace"
        except Exception:
            jmethod = "amortized_wall"
            per_b = min(max((jrun(4) - jrun(1)) / 3, 1e-9)
                        for _ in range(3))
        julia_row = {
            "julia_sweep16_ms_per_batch": round(per_b * 1e3, 2),
            "julia_sweep16_mpix_s": round(B * W * H / per_b / 1e6, 1),
            "julia_timing_method": jmethod}
        _PARTIAL.update(julia_row)
    except Exception:
        pass

    # Deep-zoom row (BASELINE config #4: 1e-12 / 10k iters, dd deltas +
    # in-kernel Zhuoran rebasing, device coloring, one RGB fetch) — guards
    # the perturbation kernel against silent between-round regressions.
    dz_row = None
    try:
        from fractalrenderer_tpu.models import deep_zoom
        from fractalrenderer_tpu.scene import FractalType

        sdz = Scene(fractal_type=FractalType.DEEP_ZOOM,
                    hp_center_x="-0.74364388703715158",
                    hp_center_y="0.13182590420531198",
                    hp_zoom="1e-12", max_iterations=10000,
                    use_perturbation=True)
        cache = {}
        _, dzinfo = deep_zoom.render(sdz, W, H, return_info=True,
                                     orbit_cache=cache)  # compile + warm
        try:
            from fractalrenderer_tpu.utils.diag import \
                measure_device_seconds as _mds

            dzs = min(_mds(lambda: deep_zoom.render(
                sdz, W, H, orbit_cache=cache)) for _ in range(2))
            if dzs <= 0:
                raise RuntimeError("empty trace")
            dmethod = "profiler_trace"
        except Exception:
            dmethod = "wall"
            t0 = time.perf_counter()
            deep_zoom.render(sdz, W, H, orbit_cache=cache)
            dzs = time.perf_counter() - t0
        dz_row = {
            "deepzoom_1e12_10k_1080p_s": round(dzs, 2),
            "deepzoom_rebase_passes": dzinfo.get("rebase_passes"),
            "deepzoom_glitched_remaining":
                dzinfo.get("glitched_pixels_remaining"),
            "deepzoom_timing_method": dmethod}
        _PARTIAL.update(dz_row)
    except Exception:
        pass

    out = {
        "metric": "mandelbrot_1080p_256iter_render",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_s / 1000.0, 3),
        "iters_per_sec": round(iters_s, 0),
        "mean_iters_per_pixel": round(mean_iters, 2),
        "timing_method": method,
    }
    if bulb_ms is not None:
        # raw bulb kernel at 100 iterations (the full render() pipeline at
        # default iterations is config6 in bench_all.json — a different,
        # heavier workload; don't compare the two numbers directly)
        out["mandelbulb_1080p_ms"] = bulb_ms
        out["mandelbulb_mpix_s"] = round(W * H / (bulb_ms / 1e3) / 1e6, 1)
    if julia_row:
        out.update(julia_row)
    if dz_row:
        out.update(dz_row)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
