"""Diagnostics & observability — the framework's equivalent of the
reference's runtime self-checks (SURVEY.md §4/§5):

- scene_debug_summary: debug_print_fractal_state (vk_engine.h:198-214)
- validate_scene: the NaN/zero repair clamps the reference applies while
  packing push constants (compute_effect_manager.h:335-345)
- params_layout_selfcheck: verify_push_constant_layout (vk_engine.cpp:
  420-446) — asserts the SMEM scalar-parameter layouts are consistent
- trace: a jax.profiler wrapper for kernel-level timing
"""
from __future__ import annotations

import contextlib
import math
from typing import Optional

from ..scene import Scene


def scene_debug_summary(scene: Scene) -> str:
    lines = [
        "=== Scene ===",
        f"type={scene.fractal_type.display_name}",
        f"center=({scene.center_x!r}, {scene.center_y!r}) zoom={scene.zoom!r}",
        f"iterations={scene.max_iterations} bailout={scene.bailout} "
        f"aa={scene.antialiasing_samples}",
        f"palette={scene.palette_mode} offset={scene.color_offset} "
        f"scale={scene.color_scale}",
        f"effects: interior={scene.interior_style} "
        f"trap={scene.orbit_trap_enabled}@{scene.orbit_trap_radius} "
        f"stripes={scene.stripe_enabled}@{scene.stripe_density}",
        f"enhance: b={scene.color_brightness} s={scene.color_saturation} "
        f"c={scene.color_contrast}",
    ]
    if scene.fractal_type.name == "JULIA" or scene.use_julia_set:
        lines.append(f"julia c = {scene.julia_c_real} + {scene.julia_c_imag}i")
    if scene.fractal_type.name == "PHOENIX":
        lines.append(f"phoenix p={scene.phoenix_p} r={scene.phoenix_r} "
                     f"julia_mode={scene.use_julia_set}")
    if scene.fractal_type.name == "MANDELBULB":
        lines.append(f"bulb power={scene.mandelbulb_power} "
                     f"cam={scene.camera_distance} rot={scene.rotation_y} "
                     f"fov={scene.fov} time={scene.time}")
    if scene.hp_center_x or scene.hp_zoom:
        lines.append(f"hp: x={scene.hp_center_x} y={scene.hp_center_y} "
                     f"zoom={scene.hp_zoom}")
    return "\n".join(lines)


def validate_scene(scene: Scene) -> Scene:
    """Repair degenerate values the way the reference does before packing
    push constants (compute_effect_manager.h:335-345): zero/NaN/inf zoom →
    default, degenerate bailout → default."""
    fixes = {}
    z = scene.zoom
    if not math.isfinite(z) or z == 0.0:
        fixes["zoom"] = 3.0
    b = scene.bailout
    if not math.isfinite(b) or b <= 0.0:
        fixes["bailout"] = 4.0
    if scene.max_iterations < 1:
        fixes["max_iterations"] = 1
    return scene.with_(**fixes) if fixes else scene


def params_layout_selfcheck() -> bool:
    """Cross-module layout assertion (analog of the reference's
    verify_push_constant_layout memory self-check)."""
    from ..ops import dd_escape, escape, perturbation

    assert escape.NPARAMS == 19
    assert escape.P_ROW0 == 11
    # index sets must be dense and unique
    esc_idx = [escape.P_CX, escape.P_CY, escape.P_ZOOM, escape.P_OFFX,
               escape.P_OFFY, escape.P_BAIL2, escape.P_LIMIT, escape.P_A0,
               escape.P_A1, escape.P_A2, escape.P_A3, escape.P_ROW0,
               escape.P_COFF, escape.P_CSCALE, escape.P_BRIGHT,
               escape.P_SAT, escape.P_CONTRAST, escape.P_BAILOUT,
               escape.P_STRIPE]
    assert sorted(esc_idx) == list(range(escape.NPARAMS))
    pert_idx = [getattr(perturbation, f"Q_{n}") for n in (
        "CXH", "CXL", "CYH", "CYL", "PSH", "PSL", "LIMIT", "BAIL2", "REFLEN",
        "GLITCH_TOL", "SHIFTXH", "SHIFTXL", "SHIFTYH", "SHIFTYL", "OFFX",
        "OFFY", "AR", "AI", "BR", "BI", "CR", "CI", "NSKIP", "ROW0",
        "ARL", "AIL", "BRL", "BIL", "CRL", "CIL", "SEXP", "M0", "FIRST",
        "Z0XH", "Z0XL", "Z0YH", "Z0YL", "PP", "RR", "SE0", "AROW0")]
    assert sorted(pert_idx) == list(range(perturbation.NQ))
    dd_idx = [getattr(dd_escape, f"D_{n}") for n in (
        "CXH", "CXL", "CYH", "CYL", "ZH", "ZL", "LIMIT", "BAIL2", "OFFX",
        "OFFY", "ROW0")]
    assert sorted(dd_idx) == list(range(dd_escape.ND))
    return True


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Profile the enclosed renders with jax.profiler (SURVEY.md §5:
    'wall-clock + jax.profiler traces')."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_seconds_from_trace(log_dir: str,
                              lane: str = "XLA Modules") -> float:
    """Sum device-side execution seconds recorded in a jax.profiler trace.

    Reads the newest ``*.trace.json.gz`` under ``log_dir`` and totals the
    complete ('X') events on the requested device lane ('XLA Modules' =
    one event per executed program, so the total is wall-clock ON DEVICE
    and immune to the host link; 'XLA Ops' gives the per-op breakdown).
    This is the link-independent timing path the benches prefer — the
    tunneled device link adds ±2x variance to any host-side clock.
    """
    import glob
    import gzip
    import json
    import os

    paths = glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f)["traceEvents"]
    device_pids = set()
    lane_tids = set()
    cpu_exec_tids = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" and \
                e["args"]["name"].startswith("/device:"):
            device_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            if e["args"]["name"] == lane:
                lane_tids.add((e["pid"], e["tid"]))
            elif e["args"]["name"].startswith("tf_XLAPjRtCpuClient"):
                # the CPU backend has no /device: track — execution shows
                # on the PjRt CPU client threads of the host process
                cpu_exec_tids.add((e["pid"], e["tid"]))
    # Sum per device, then take the busiest device: chips of an SPMD
    # program run concurrently, so elapsed device wall-clock is the max
    # over chips, not the sum (summing would over-report N-chip runs Nx).
    per_pid = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids \
                and (e["pid"], e.get("tid")) in lane_tids:
            per_pid[e["pid"]] = per_pid.get(e["pid"], 0) + e.get("dur", 0)
    total_us = max(per_pid.values(), default=0)
    if total_us == 0 and not device_pids:
        total_us = sum(
            e.get("dur", 0) for e in events
            if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in cpu_exec_tids)
    if total_us == 0:
        raise ValueError(
            f"trace under {log_dir} has no events on lane {lane!r} "
            f"(and no CPU-client fallback events) — wrong lane name or "
            f"nothing executed inside the trace")
    return total_us / 1e6


def measure_link_bandwidth(mb: int = 64, reps: int = 3) -> dict:
    """Timed raw device→host copy of a known size: the D2H link rate that
    bounds streaming exports (giant stills fetch H·W·3·bytes over this
    link — the reference's analog is its synchronous staging-buffer
    readback, vk_engine.cpp:1939-2003).  Returns best/mean MB/s over
    ``reps`` fetches of one ``mb``-MiB uint8 device buffer.  Host-side
    clocks over the tunneled link swing ±2x, hence best-of."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = mb * 1024 * 1024
    # computed (not constant-folded-to-host) so the fetch is a real D2H
    x = jnp.arange(n, dtype=jnp.uint32).astype(jnp.uint8)
    jax.block_until_ready(x)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        host = np.asarray(x)
        times.append(time.perf_counter() - t0)
    assert host.nbytes == n
    return {"mb": mb, "best_mb_s": round(n / min(times) / 1e6, 1),
            "mean_mb_s": round(n * len(times) / sum(times) / 1e6, 1)}


def measure_vpu_peak(chains: int = 8, k: int = 2000) -> dict:
    """Empirical VPU f32 peak: ``chains`` independent FMA chains over
    VMEM tiles, trace-timed.  This is the roofline DENOMINATOR for the
    escape/march kernels (elementwise f32 on the VPU — the MXU plays no
    part in these workloads): no per-chip VPU spec is published, and a
    measured synthetic upper bound is the honest comparator.  Measured
    1126 GFLOP/s on TPU v5e (2026-08)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TH, TW, GH, GW = 256, 128, 8, 8

    def kernel(x_ref, o_ref):
        a = x_ref[:, :]
        accs = tuple(a + jnp.float32(i) for i in range(chains))

        def body(_, accs):
            return tuple(acc * jnp.float32(1.000001) + jnp.float32(0.5)
                         for acc in accs)

        accs = jax.lax.fori_loop(0, k, body, accs)
        s = accs[0]
        for acc in accs[1:]:
            s = s + acc
        o_ref[:, :] = s

    @jax.jit
    def run(x):
        spec = pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(GH, GW), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((GH * TH, GW * TW),
                                           jnp.float32))(x)

    x = jnp.ones((GH * TH, GW * TW), jnp.float32)
    out = run(x)
    jax.block_until_ready(out)

    def r():
        o = run(x)
        float(np.asarray(o[0, 0]))

    s = min(measure_device_seconds(r) for _ in range(3))
    flops = 2 * k * chains * (GH * TH) * (GW * TW)
    return {"seconds": round(s, 5),
            "gflops_f32": round(flops / s / 1e9, 1)}


def measure_device_seconds(run, log_dir: Optional[str] = None) -> float:
    """Execute ``run()`` (which must block until its device work completes,
    e.g. end with a scalar fetch) under a profiler trace and return the
    device-side seconds it spent.  Traces into a temp dir by default."""
    import tempfile

    ctx = (contextlib.nullcontext(log_dir) if log_dir is not None
           else tempfile.TemporaryDirectory())
    with ctx as d:
        with trace(d):
            run()
        return device_seconds_from_trace(d)
