"""Command-line interface — the framework's replacement for the reference's
interactive-only entry point (src/main.cpp ignores argv; all configuration
lived in the ImGui UI).  The UI semantics survive as CLI verbs + scene
configs (SURVEY.md §7 'out of scope' mapping).

Usage examples:
  python -m fractalrenderer_tpu.cli render --type mandelbrot --out m.png
  python -m fractalrenderer_tpu.cli render --preset "Seahorse Valley" \\
      --width 1920 --height 1080 --aa 2 --out sea.png
  python -m fractalrenderer_tpu.cli animate --franim zoom.franim --out-dir frames/
  python -m fractalrenderer_tpu.cli export-print --width 2400 --height 3000 \\
      --supersample --out print.png
  python -m fractalrenderer_tpu.cli presets
  python -m fractalrenderer_tpu.cli info
"""
from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

import numpy as np

from . import presets as presets_mod
from .scene import FractalType, Scene
from .utils import png
from .utils.image import to_export_orientation


def _add_scene_args(p: argparse.ArgumentParser):
    p.add_argument("--type", default=None,
                   help="mandelbrot|julia|burning-ship|phoenix|mandelbulb|deep-zoom")
    p.add_argument("--scene", default=None, help="scene JSON file")
    p.add_argument("--preset", default=None, help="named location preset")
    p.add_argument("--center", type=float, nargs=2, default=None,
                   metavar=("X", "Y"),
                   help="view center as one flag (same as --center-x/-y; "
                        "also makes the bare '--center' prefix unambiguous)")
    p.add_argument("--center-x", type=float, default=None)
    p.add_argument("--center-y", type=float, default=None)
    p.add_argument("--zoom", type=float, default=None)
    p.add_argument("--iters", type=int, default=None)
    p.add_argument("--bailout", type=float, default=None)
    p.add_argument("--aa", type=int, default=None, choices=(1, 2, 4, 8))
    p.add_argument("--palette", type=int, default=None)
    p.add_argument("--color-offset", type=float, default=None)
    p.add_argument("--color-scale", type=float, default=None)
    p.add_argument("--brightness", type=float, default=None)
    p.add_argument("--saturation", type=float, default=None)
    p.add_argument("--contrast", type=float, default=None)
    p.add_argument("--interior-style", type=int, default=None)
    p.add_argument("--orbit-trap", action="store_true", default=None)
    p.add_argument("--orbit-trap-radius", type=float, default=None)
    p.add_argument("--stripes", action="store_true", default=None)
    p.add_argument("--stripe-density", type=float, default=None)
    p.add_argument("--julia-cr", type=float, default=None)
    p.add_argument("--julia-ci", type=float, default=None)
    p.add_argument("--julia-preset", default=None,
                   help="named Julia c preset (e.g. \"Douady's Rabbit\")")
    p.add_argument("--deep-julia", dest="deep_julia", action="store_true",
                   default=None,
                   help="deep-zoom the JULIA set of --julia-cr/ci (beyond "
                        "the reference, which only deep-zooms Mandelbrot)")
    p.add_argument("--deep-ship", dest="deep_ship", action="store_true",
                   default=None,
                   help="deep-zoom the BURNING SHIP via diffabs "
                        "perturbation (beyond the reference)")
    p.add_argument("--deep-phoenix", dest="deep_phoenix",
                   action="store_true", default=None,
                   help="deep-zoom the PHOENIX set (two-term-recurrence "
                        "perturbation; beyond the reference)")
    p.add_argument("--phoenix-p", type=float, default=None)
    p.add_argument("--phoenix-r", type=float, default=None)
    p.add_argument("--use-julia-set", action="store_true", default=None)
    p.add_argument("--power", type=float, default=None,
                   help="mandelbulb power")
    p.add_argument("--time", type=float, default=None,
                   help="mandelbulb animation clock")
    p.add_argument("--hp-center-x", default=None,
                   help="high-precision center (decimal string, deep zoom)")
    p.add_argument("--hp-center-y", default=None)
    p.add_argument("--hp-zoom", default=None)
    p.add_argument("--perturbation", action="store_true", default=None)
    p.add_argument("--series", action="store_true", default=None,
                   help="series-approximation iteration skip (deep zoom; "
                        "exact — counts are unchanged)")
    p.add_argument("--spp", type=int, default=None, choices=(1, 2, 4),
                   help="deep-zoom samples per pixel axis (spp^2 subpixel "
                        "samples, device-batched; ui_manager.cpp:659-757 "
                        "samples toggle)")
    p.add_argument("--exact-dust", action="store_true",
                   help="Burning Ship dust tier (--deep-ship): per-pixel "
                        "error ledger + 160-bit orbit + HP fallback for "
                        "flagged lanes — oracle-exact counts in chaotic "
                        "dust, at extra host cost (DESIGN.md §8)")


_ARG_TO_FIELD = {
    "center_x": "center_x", "center_y": "center_y", "zoom": "zoom",
    "iters": "max_iterations", "bailout": "bailout",
    "aa": "antialiasing_samples", "palette": "palette_mode",
    "color_offset": "color_offset", "color_scale": "color_scale",
    "brightness": "color_brightness", "saturation": "color_saturation",
    "contrast": "color_contrast", "interior_style": "interior_style",
    "orbit_trap": "orbit_trap_enabled",
    "orbit_trap_radius": "orbit_trap_radius",
    "stripes": "stripe_enabled", "stripe_density": "stripe_density",
    "julia_cr": "julia_c_real", "julia_ci": "julia_c_imag",
    "phoenix_p": "phoenix_p", "phoenix_r": "phoenix_r",
    "use_julia_set": "use_julia_set", "power": "mandelbulb_power",
    "time": "time", "hp_center_x": "hp_center_x",
    "hp_center_y": "hp_center_y", "hp_zoom": "hp_zoom",
    "perturbation": "use_perturbation",
    "deep_julia": "deep_zoom_julia",
    "deep_ship": "deep_zoom_ship",
    "deep_phoenix": "deep_zoom_phoenix",
    "series": "use_series_approximation",
    "spp": "samples_per_pixel",
}


def scene_from_args(args) -> Scene:
    if args.scene:
        with open(args.scene) as f:
            scene = Scene.from_dict(json.load(f))
    else:
        scene = Scene()
    if args.preset:
        scene = presets_mod.find_preset(args.preset).apply(scene)
    if getattr(args, "julia_preset", None):
        cr, ci = presets_mod.JULIA_PRESETS[args.julia_preset]
        scene = scene.with_(julia_c_real=cr, julia_c_imag=ci,
                            fractal_type=FractalType.JULIA)
    if args.type:
        scene = scene.with_(fractal_type=FractalType.parse(args.type))
    if getattr(args, "center", None) is not None:
        # fill only axes the user didn't set explicitly — an explicit
        # --center-x/--center-y always wins over the pair flag
        if args.center_x is None:
            args.center_x = args.center[0]
        if args.center_y is None:
            args.center_y = args.center[1]
    overrides = {}
    for arg, fld in _ARG_TO_FIELD.items():
        v = getattr(args, arg, None)
        if v is not None:
            overrides[fld] = v
    if overrides:
        scene = scene.with_(**overrides)
    return scene


@contextlib.contextmanager
def _orbit_progress():
    """Print reference-orbit progress to stderr during deep-zoom renders
    (the reference prints every 5%, deep_zoom_system.cpp:313-318).
    Multiple orbits may be computed in one context (zoom paths,
    secondary references) — a new orbit (done going backwards or a new
    total) finishes the previous line and restarts the 5% ladder."""
    from .deepzoom import orbit as _orbit

    st = {"last": -1, "prev_done": None, "total": None}

    def hook(done, total):
        if (st["total"] != total
                or (st["prev_done"] is not None and done < st["prev_done"])):
            if st["last"] >= 0:
                print(file=sys.stderr)  # finish the previous orbit's line
            st["last"] = -1
            st["total"] = total
        st["prev_done"] = done
        pct = done * 100 // max(total, 1)
        if pct // 5 > st["last"]:
            st["last"] = pct // 5
            print(f"\r  reference orbit {done}/{total} ({pct}%)",
                  end="", file=sys.stderr, flush=True)

    prev = _orbit.progress_hook
    _orbit.progress_hook = hook
    try:
        yield
    finally:
        _orbit.progress_hook = prev
        if st["last"] >= 0:
            print(file=sys.stderr)


def _render(scene: Scene, width: int, height: int, golden: bool):
    if golden:
        from .reference import golden as g

        return g.render_scene(scene, width, height)
    from . import models

    return np.asarray(models.render(scene, width, height))


# Seconds of device silence before the first-frame fallback kicks in: a
# cache-hit device render finishes well inside this, so the preview only
# ever runs on a genuinely cold compile.
_PREVIEW_AFTER_S = 2.0


def _render_first_frame_fast(scene: Scene, args, t0: float):
    """Device render with a first-visible-frame fallback (the reference
    shows pixels in milliseconds from launch — prebuilt SPIR-V,
    compute_effect_manager.cpp:120-138; a fresh TPU process blocks on a
    remote XLA compile that can take minutes).

    The device render runs in a worker thread; if it hasn't finished
    after _PREVIEW_AFTER_S, the identical pipeline renders on the local
    CPU backend (models.render_preview_cpu) and is written to --out
    ATOMICALLY, so the user has a correct full-resolution frame on disk
    while the device compile proceeds — then the device frame replaces
    it.  --golden and unsupported families skip the fallback.
    FRACTAL_TPU_NO_PREVIEW=1 disables (timing scripts)."""
    import threading

    from . import models

    if args.golden or os.environ.get("FRACTAL_TPU_NO_PREVIEW"):
        return _render(scene, args.width, args.height, args.golden)
    res: dict = {}

    def job():
        try:
            res["img"] = np.asarray(models.render(scene, args.width,
                                                  args.height))
        except BaseException as e:  # surfaced after join
            res["err"] = e

    th = threading.Thread(target=job, daemon=True, name="device-render")
    th.start()
    th.join(_PREVIEW_AFTER_S)
    if th.is_alive():
        try:
            pv = models.render_preview_cpu(scene, args.width, args.height)
        except Exception:
            pv = None
        if pv is not None and th.is_alive():
            meta = {"Software": "fractalrenderer_tpu (preview)",
                    **scene.metadata_summary()}
            tmp = args.out + ".preview.tmp"
            png.write_png(tmp, to_export_orientation(pv),
                          bit_depth=args.bit_depth, metadata=meta,
                          dpi=args.dpi)
            os.replace(tmp, args.out)
            print(f"first frame ready after {time.monotonic() - t0:.1f}s "
                  f"(CPU preview at {args.out}; device kernel still "
                  "compiling...)", flush=True)
        th.join()
    if "err" in res:
        raise res["err"]
    return res["img"]


def _size_ok(args) -> bool:
    """A non-positive --width/--height must be a clean error, not a
    kernel-shape traceback (the reference's panel clamps its inputs,
    ui_manager.cpp:617-618)."""
    w, h = getattr(args, "width", 1), getattr(args, "height", 1)
    if w < 1 or h < 1:
        print(f"error: bad render size {w}x{h}", file=sys.stderr)
        return False
    return True


def cmd_render(args) -> int:
    if not _size_ok(args):
        return 2
    if getattr(args, "sharded", False) and (
            args.golden or getattr(args, "precision", "f32") == "dd"):
        print("--sharded does not combine with --golden or "
              "--precision dd", file=sys.stderr)
        return 2
    scene = scene_from_args(args)
    if getattr(args, "exact_dust", False) and not (
            scene.fractal_type == FractalType.DEEP_ZOOM
            and getattr(scene, "deep_zoom_ship", False)):
        # a silently-ignored exactness flag would be worse than an error
        print("--exact-dust is the Burning Ship dust tier: use "
              "--type deep-zoom --deep-ship (see DESIGN.md §8)",
              file=sys.stderr)
        return 2
    if args.debug:
        from .utils.diag import scene_debug_summary

        print(scene_debug_summary(scene), file=sys.stderr)
    t0 = time.monotonic()
    dz_info = None
    if getattr(args, "precision", "f32") == "dd":
        if scene.fractal_type != FractalType.MANDELBROT:
            print("--precision dd is the double-double MANDELBROT kernel "
                  f"(got --type {scene.fractal_type.name.lower()})",
                  file=sys.stderr)
            return 2
        from .models.mandelbrot import render_dd

        img = render_dd(scene, args.width, args.height)
    elif scene.fractal_type.name == "DEEP_ZOOM" and not args.golden:
        from .models import deep_zoom
        from .utils.diag import validate_scene

        dz_kw = {}
        if getattr(args, "sharded", False):
            from .parallel import make_render_mesh

            dz_kw["mesh"] = make_render_mesh()
        if getattr(args, "exact_dust", False):
            dz_kw["exact_dust"] = True
        with _orbit_progress():
            # quantize on device to the output bit depth (byte-identical
            # PNG, 1-2 B/channel over the link instead of 4)
            img, dz_info = deep_zoom.render(validate_scene(scene),
                                            args.width, args.height,
                                            return_info=True,
                                            quantize=args.bit_depth,
                                            **dz_kw)
        img = np.asarray(img)
    elif getattr(args, "sharded", False) and not args.golden:
        # row-band mesh sharding for a single frame (bit-identical to the
        # single-device render; gather-free — parallel/tiled.py)
        if scene.fractal_type == FractalType.MANDELBULB:
            from .models.mandelbulb import render_sharded as _rs
        else:
            from .parallel import render_sharded as _rs
        img = np.asarray(_rs(scene, args.width, args.height))
    else:
        img = _render_first_frame_fast(scene, args, t0)
    dt = time.monotonic() - t0
    meta = {"Software": "fractalrenderer_tpu",
            "Fractal": scene.fractal_type.display_name,
            **scene.metadata_summary()}
    png.write_png(args.out, to_export_orientation(img),
                  bit_depth=args.bit_depth, metadata=meta,
                  dpi=args.dpi)
    mpix = args.width * args.height / dt / 1e6
    print(f"Rendered {args.width}x{args.height} "
          f"{scene.fractal_type.display_name} in {dt*1e3:.1f} ms "
          f"({mpix:.0f} Mpix/s incl. host transfer) -> {args.out}")
    if dz_info is not None:
        algo = dz_info.get("algorithm", "secondary_refs")
        if algo == "rebase":
            algo = f"rebase x{dz_info['rebase_passes']} passes"
        print(f"  deep zoom: {dz_info['precision_mode']} "
              f"({dz_info['precision_bits']} bits), {algo}, "
              f"{dz_info['references_used']} reference orbit(s), "
              f"{dz_info['glitched_pixels_initial']} glitch-flagged -> "
              f"{dz_info['fallback_pixels']} HP-fallback, "
              f"{dz_info['glitched_pixels_remaining']} remaining")
    return 0


# Above this many rendered pixels (supersampling included) export-print
# streams through the banded giant-still path instead of materializing
# one frame — the reference's single-staging-buffer export simply fails
# there (vk_engine.cpp:1939-2003); here the 32000-cap presets stay
# reachable on one chip.
_BANDED_EXPORT_PIXELS = 1 << 27  # 134M px ≈ 1.6 GB f32 RGB


def cmd_export_print(args) -> int:
    """16-bit print export (vk_engine.cpp:1796-2232): renders at 2x when
    supersampling and embeds gAMA/sRGB/300DPI/tEXt metadata.  Oversized
    renders delegate to the resumable banded exporter automatically."""
    if not _size_ok(args):
        return 2
    scene = scene_from_args(args)
    rw = args.width * 2 if args.supersample else args.width
    rh = args.height * 2 if args.supersample else args.height
    if max(rw, rh) > 32000:  # ui_manager.cpp:617-618
        print("error: render dimension exceeds 32000 cap", file=sys.stderr)
        return 2
    if rw * rh > _BANDED_EXPORT_PIXELS and not args.golden:
        from .parallel import render_giant_still

        meta = {
            "Software": "fractalrenderer_tpu (print export)",
            "Print Size (inches)":
                f"{args.width/args.dpi:.2f} x {args.height/args.dpi:.2f}",
        }
        ss = bool(args.supersample and args.downsample)
        w, h = ((args.width, args.height) if ss or not args.supersample
                else (rw, rh))
        print(f"{rw}x{rh} render exceeds one-pass size; streaming in "
              "bands (resumable)")
        t0 = time.monotonic()
        render_giant_still(scene, w, h, args.out, bit_depth=16,
                           dpi=args.dpi, supersample=ss,
                           extra_metadata=meta, keep_tiles=False)
        print(f"Exported {w}x{h} 16-bit PNG in "
              f"{time.monotonic()-t0:.1f}s -> {args.out}")
        return 0
    t0 = time.monotonic()
    img = _render(scene, rw, rh, args.golden)
    if args.supersample and args.downsample:
        from .utils.image import downsample2x

        img = downsample2x(img)
    meta = {
        "Software": "fractalrenderer_tpu (print export)",
        "Print Size (inches)": f"{args.width/args.dpi:.2f} x {args.height/args.dpi:.2f}",
        **scene.metadata_summary(),
    }
    png.write_png(args.out, to_export_orientation(img), bit_depth=16,
                  metadata=meta, dpi=args.dpi)
    print(f"Exported {img.shape[1]}x{img.shape[0]} 16-bit PNG in "
          f"{time.monotonic()-t0:.1f}s -> {args.out}")
    return 0


def cmd_animate(args) -> int:
    from .anim import AnimationRenderer, franim, video
    from .anim.keyframes import Animation

    from .anim.keyframes import Keyframe

    if args.franim:
        try:
            anim = franim.load(args.franim)
        except (ValueError, OSError) as e:
            print(f"error: cannot load {args.franim}: {e}",
                  file=sys.stderr)
            return 2
    else:
        # Build a two-keyframe zoom animation from CLI args
        scene = scene_from_args(args)
        end = scene.with_(zoom=args.zoom_to) if args.zoom_to else scene
        anim = Animation(duration=args.duration, target_fps=args.fps or 60)
        anim.keyframes.append(Keyframe(0.0, scene))
        anim.keyframes.append(Keyframe(args.duration, end))
    if args.fps:
        anim.target_fps = args.fps
    if args.duration and args.franim is None:
        anim.duration = args.duration
    if args.width:
        anim.export_width = args.width
    if args.height:
        anim.export_height = args.height
    if args.save_franim:
        franim.save(anim, args.save_franim)
        print(f"Saved animation -> {args.save_franim}")

    r = AnimationRenderer(batch_size=args.batch_size)
    last = [-1]

    def on_frame(f, total):
        pct = 100.0 * r.progress.progress
        if f - last[0] >= max(1, total // 100):
            print(f"\rRendering frame {f+1}/{total} ({pct:.1f}%) "
                  f"ETA {r.progress.estimated_time_remaining:.0f}s",
                  end="", flush=True)
            last[0] = f

    r.on_frame_complete = on_frame
    if args.sharded:
        import jax

        from .parallel import make_render_mesh

        # frames axis = all available chips; rows axis 1 (frame-parallel)
        r.mesh = make_render_mesh(frames=len(jax.devices()))
    ok = r.start_render(anim, args.out_dir, args.width, args.height,
                        bit_depth=args.bit_depth, resume=args.resume)
    print()
    if not ok:
        print("render failed or cancelled", file=sys.stderr)
        return 1
    print(f"Rendered {anim.total_frames} frames -> {args.out_dir}")
    if args.encode:
        settings = video.VideoEncodeSettings(
            output_filename=args.video_out
            or os.path.join(args.out_dir, "animation.mp4"),
            codec=video.VideoCodec(args.codec),
            quality=video.VideoQuality(args.quality),
            fps=anim.target_fps, crf=args.crf,
            cleanup_frames=args.cleanup_frames)
        enc = video.VideoEncoder()
        if not enc.encode(args.out_dir, settings):
            print(f"encode failed: {enc.progress.error}", file=sys.stderr)
            return 1
        print(f"Encoded -> {settings.output_filename}")
    return 0


def cmd_encode(args) -> int:
    from .anim import video

    settings = video.VideoEncodeSettings(
        output_filename=args.out, codec=video.VideoCodec(args.codec),
        quality=video.VideoQuality(args.quality), fps=args.fps,
        crf=args.crf, audio_file=args.audio or "",
        cleanup_frames=args.cleanup_frames)
    enc = video.VideoEncoder()

    def on_p(p):
        print(f"\rframe {p.current_frame}/{p.total_frames} fps={p.fps:.0f}",
              end="", flush=True)

    enc.on_progress = on_p
    ok = enc.encode(args.frames_dir, settings)
    print()
    if not ok:
        print(f"encode failed: {enc.progress.error}", file=sys.stderr)
        return 1
    # qtpng corrects the extension to .mov in settings
    print(f"Encoded -> {settings.output_filename}")
    return 0


def cmd_giant(args) -> int:
    from .parallel import render_giant_still

    if not _size_ok(args):
        return 2
    scene = scene_from_args(args)
    done = [0]

    def cb(b, total):
        print(f"\rband {b}/{total}", end="", flush=True)
        done[0] = b

    info = render_giant_still(
        scene, args.width, args.height, args.out,
        band_rows=args.band_rows, tile_dir=args.tile_dir,
        resume=not args.no_resume, bit_depth=args.bit_depth, dpi=args.dpi,
        use_mesh=args.mesh, supersample=args.supersample, progress_cb=cb)
    print(f"\n{info['rendered']} bands rendered, {info['skipped']} resumed "
          f"-> {info['out']}")
    return 0


def cmd_zoom_path(args) -> int:
    """Render one of the reference's deep-zoom preset sequences
    (deep_zoom_system.cpp:575-602) as a frame sequence with log-zoom
    interpolation."""
    import math

    from .deepzoom.manager import ZoomKeyframe, preset_zoom_path
    from .models import render as model_render
    from .scene import FractalType

    base = scene_from_args(args).with_(fractal_type=FractalType.DEEP_ZOOM,
                                       use_perturbation=True)
    if args.preset_zoom:
        path = preset_zoom_path(args.preset_zoom)
        start, end = path[0], path[1]
    else:
        # the deep-zoom panel's typed Target X/Y/Zoom + Start Zoom
        # Animation (ui_manager.cpp:701-710): zoom from the current view
        # (scene flags / defaults) to the custom target, exactly
        # DeepZoomManager.zoom_to's path shape
        if None in (args.target_x, args.target_y, args.target_zoom):
            print("zoom-path needs --preset-zoom or all of --target-x/"
                  "--target-y/--target-zoom", file=sys.stderr)
            return 2
        start = ZoomKeyframe(base.center_x, base.center_y, base.zoom, 0.0)
        end = ZoomKeyframe(args.target_x, args.target_y, args.target_zoom)
    os.makedirs(args.out_dir, exist_ok=True)
    # One reference orbit at the final (deepest) center serves every frame
    # via the shift mechanism; the cache also holds any secondary
    # references across frames.  The reference recomputed per frame
    # (deep_zoom_system.cpp:454-559) — O(frames x orbit cost) for nothing.
    ref_center = (repr(end.center_x), repr(end.center_y))
    cache = {}
    with _orbit_progress():
        for f in range(args.frames):
            t = f / max(args.frames - 1, 1)
            cx = start.center_x + t * (end.center_x - start.center_x)
            cy = start.center_y + t * (end.center_y - start.center_y)
            zoom = math.exp(math.log(start.zoom)
                            + t * (math.log(end.zoom)
                                   - math.log(start.zoom)))
            sc = base.with_(center_x=cx, center_y=cy, zoom=zoom,
                            hp_center_x=repr(cx), hp_center_y=repr(cy),
                            hp_zoom=repr(zoom))
            # quantize=8 on device: frames fetch uint8 (byte-identical
            # PNGs, 4x less link traffic than f32 RGB)
            img = np.asarray(model_render(sc, args.width, args.height,
                                          ref_center=ref_center,
                                          orbit_cache=cache, quantize=8))
            png.write_png(os.path.join(args.out_dir, f"frame_{f:06d}.png"),
                          to_export_orientation(img))
            print(f"\rframe {f+1}/{args.frames} zoom={zoom:.3e}", end="",
                  flush=True)
    print()
    return 0


def cmd_sweep(args) -> int:
    """BASELINE config #2: render a batch of Julia c values in one device
    dispatch and write a PNG per c."""
    from .models.julia import render_c_sweep
    from .scene import FractalType

    scene = scene_from_args(args).with_(fractal_type=FractalType.JULIA)
    c0 = tuple(float(v) for v in args.c_start.split(","))
    c1 = tuple(float(v) for v in args.c_end.split(","))
    n = max(args.count, 1)
    cs = [(c0[0] + (c1[0] - c0[0]) * k / max(n - 1, 1),
           c0[1] + (c1[1] - c0[1]) * k / max(n - 1, 1)) for k in range(n)]
    t0 = time.monotonic()
    out = np.asarray(render_c_sweep(scene, cs, args.width, args.height))
    dt = time.monotonic() - t0
    os.makedirs(args.out_dir, exist_ok=True)
    for k, (img, c) in enumerate(zip(out, cs)):
        png.write_png(os.path.join(args.out_dir, f"sweep_{k:03d}.png"),
                      to_export_orientation(img),
                      metadata={"Julia c": f"{c[0]} + {c[1]}i"})
    mpix = n * args.width * args.height / dt / 1e6
    print(f"Rendered {n} c values in {dt:.2f}s ({mpix:.0f} Mpix/s) "
          f"-> {args.out_dir}")
    return 0


def cmd_interactive(args) -> int:
    scene = scene_from_args(args)
    no_explicit_view = (args.zoom is None and args.scene is None
                        and args.preset is None)
    if no_explicit_view:
        scene = scene.with_(zoom=2.5)
    # A wedged device link would hang the session's FIRST frame with no
    # message — probe with a bound and bail with the recovery recipe
    # instead (same daemon-thread trick as `info`).
    res = _probe_devices()
    if "devices" not in res:
        why = (f"failed to initialize: {res['error']}" if "error" in res
               else "unresponsive (probe blocked >180s) — the device link "
                    "may be wedged")
        print(f"error: device backend {why}.  CPU fallback: re-run with "
              "--cpu (or fix the device and retry)", file=sys.stderr)
        return 1
    # Live raw-terminal loop on a TTY (the reference's real-time event
    # loop); line-based REPL when piped or forced with --repl.
    live_mode = args.live or (not args.repl and sys.stdin.isatty())
    if live_mode:
        from . import live

        # the reference resumes where you left it (imgui.ini persists
        # next to the binary); explicit view args or --fresh start clean
        # Exit without interpreter/XLA teardown ON EVERY PATH (normal
        # return, ^C, device errors): the session's background compile
        # thread (prewarm_ladder) may still be inside an XLA compile — a
        # tunnel compile can take minutes, so joining is not an option,
        # and letting interpreter shutdown kill the daemon thread aborts
        # the whole process ("FATAL: exception not rethrown" → SIGABRT)
        # when the C++ exception in flight crosses the dying thread.
        # run_live restores the terminal and persists the session on all
        # of these paths itself; nothing later relies on atexit.
        rc = 1
        try:
            rc = live.run_live(
                scene, cols=args.cols, rows=args.rows,
                spin=args.spin, max_frames=args.max_frames,
                resume_last=no_explicit_view and not args.fresh,
                persist=not args.fresh, gfx=args.gfx)
        except BaseException:
            import traceback

            traceback.print_exc()
        finally:
            sys.stdout.flush()
            sys.stderr.flush()
            os._exit(rc)
    from . import viewer

    return viewer.run(scene, cols=args.cols, rows=args.rows)


def cmd_presets(args) -> int:
    print("Location presets (fractal_state.h:171-189):")
    for p in presets_mod.MANDELBROT_PRESETS + presets_mod.BURNING_SHIP_PRESETS:
        print(f"  {p.name:18s} {p.fractal_type.display_name:13s} "
              f"center=({p.center_x}, {p.center_y}) zoom={p.zoom} "
              f"iters={p.iterations}")
    print("\nJulia c presets:")
    for name, (cr, ci) in presets_mod.JULIA_PRESETS.items():
        print(f"  {name:18s} c = {cr} + {ci}i")
    print("\nPhoenix (p, r) presets:")
    for name, (pp, rr) in presets_mod.PHOENIX_PRESETS.items():
        print(f"  {name:18s} p={pp} r={rr}")
    print("\nMandelbulb power presets:")
    for name, pw in presets_mod.MANDELBULB_POWER_PRESETS.items():
        print(f"  {name:18s} power={pw}")
    print("\nDeep-zoom targets (deep_zoom_system.cpp:575-602):")
    for z in presets_mod.DEEP_ZOOM_PRESETS:
        print(f"  {z.name:22s} center=({z.center_x}, {z.center_y}) "
              f"zoom={z.zoom}")
    print("\nPrint sizes (ui_manager.cpp:595-611):")
    for name, (w, h) in presets_mod.PRINT_SIZE_PRESETS.items():
        print(f"  {name:18s} {w}x{h}")
    from .ops import palettes as pal

    print("\nPalettes:")
    print(f"  mandelbrot/phoenix ({pal.num_palettes('classic')}): "
          + ", ".join(pal.CLASSIC_NAMES))
    print(f"  julia/burning-ship ({pal.num_palettes('enhanced')}): "
          + ", ".join(pal.ENHANCED_NAMES))
    print(f"  deep zoom ({pal.num_palettes('deepzoom')}): hsv, blue, fire, gray")
    print(f"  mandelbulb ({pal.num_palettes('bulb')}): dynamic, fire_and_ice,"
          " lava, neon, dynamic^0.5, fire_and_ice^0.6")
    return 0


def _probe_devices(timeout_s: float = 180.0) -> dict:
    """Bounded backend discovery: returns {backend, devices} or {} if the
    probe blocked past the timeout.  Discovery can block forever inside
    the PJRT client when a tunneled device is wedged (SIGALRM never fires
    inside the C call, but the GIL is released, so a daemon-thread probe
    works) — diagnostics and session startup must not hang precisely when
    things are broken.  The bound is generous because a HEALTHY tunnel's
    client creation has been observed anywhere from 9 s to 138 s within
    one hour (2026-08-18); after 20 s a notice distinguishes "slow link,
    still waiting" from a silent hang."""
    import threading
    import time

    import jax

    res = {}

    def probe():
        try:
            res["backend"] = jax.default_backend()
            res["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # init error, NOT a hang — report distinctly
            res["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(min(20.0, timeout_s))
    if t.is_alive() and timeout_s > 20.0:
        deadline = time.monotonic() + (timeout_s - 20.0)
        print(f"device link is slow to initialize — waiting up to "
              f"{timeout_s:.0f}s total...", file=sys.stderr)
        while t.is_alive() and time.monotonic() < deadline:
            t.join(5.0)
    return res


def cmd_info(args) -> int:
    import jax

    from . import __version__

    print(f"fractalrenderer_tpu {__version__}")
    res = _probe_devices()
    if "devices" in res:
        print(f"jax {jax.__version__}, backend: {res['backend']}")
        for d in res["devices"]:
            print(f"  device: {d}")
    elif "error" in res:
        print(f"jax {jax.__version__}, backend: INIT FAILED "
              f"({res['error']}).  CPU fallback: re-run with --cpu")
    else:
        print(f"jax {jax.__version__}, backend: UNRESPONSIVE "
              "(device probe blocked >180s — the device link may be "
              "wedged; renders will hang too.  CPU fallback: re-run "
              "with --cpu)")
    from .anim.video import ffmpeg_available

    if ffmpeg_available():
        print("ffmpeg: available")
    else:
        print("ffmpeg: NOT FOUND (video encoding disabled; "
              "PNG sequences still work)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="fractalrenderer_tpu",
        description="TPU-native fractal renderer (JAX/Pallas)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (Pallas kernels run in "
                         "interpret mode).  More reliable than "
                         "JAX_PLATFORMS=cpu: the config call wins even "
                         "when a TPU PJRT plugin is registered")
    sub = ap.add_subparsers(dest="command", required=True)
    # --cpu is also accepted AFTER the subcommand (added to every
    # subparser at the end of this function with a SUPPRESS default so
    # it never clobbers the main parser's value) — the wedged-link
    # recovery messages say "re-run with --cpu" and both positions work.

    p = sub.add_parser("render", help="render one frame to PNG")
    _add_scene_args(p)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--out", default="fractal.png")
    p.add_argument("--bit-depth", type=int, default=8, choices=(8, 16))
    p.add_argument("--dpi", type=float, default=None)
    p.add_argument("--golden", action="store_true",
                   help="render with the CPU golden reference (slow)")
    p.add_argument("--precision", default="f32", choices=("f32", "dd"),
                   help="dd = double-double kernel (mandelbrot only)")
    p.add_argument("--debug", action="store_true",
                   help="print a scene debug summary")
    p.add_argument("--sharded", action="store_true",
                   help="shard the frame's rows across all devices "
                        "(bit-identical to the single-device render)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("export-print",
                       help="16-bit print-quality export @300DPI")
    _add_scene_args(p)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--supersample", action="store_true",
                   help="render at 2x (written as-is, like the reference)")
    p.add_argument("--downsample", action="store_true",
                   help="box-filter the 2x render back to target size")
    p.add_argument("--dpi", type=float, default=300.0)
    p.add_argument("--out", default="print.png")
    p.add_argument("--golden", action="store_true")
    p.set_defaults(fn=cmd_export_print)

    p = sub.add_parser("animate", help="render an animation (.franim or zoom)")
    _add_scene_args(p)
    p.add_argument("--franim", default=None, help=".franim animation file")
    p.add_argument("--zoom-to", type=float, default=None,
                   help="end zoom for a 2-keyframe zoom animation")
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--fps", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--out-dir", default="frames")
    p.add_argument("--save-franim", default=None,
                   help="also write the animation as a .franim file")
    p.add_argument("--bit-depth", type=int, default=8, choices=(8, 16))
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--resume", action="store_true",
                   help="skip frames already complete in --out-dir "
                        "(resume an interrupted sequence render)")
    p.add_argument("--sharded", action="store_true",
                   help="shard frame batches across all devices "
                        "(2D families; frames axis = device count)")
    p.add_argument("--encode", action="store_true")
    p.add_argument("--video-out", default=None)
    p.add_argument("--codec", default="h264",
                   choices=["h264", "h265", "vp9", "prores", "av1", "qtpng"])
    p.add_argument("--quality", default="high",
                   choices=["draft", "good", "high", "lossless"])
    p.add_argument("--crf", type=int, default=18)
    p.add_argument("--cleanup-frames", action="store_true")
    p.set_defaults(fn=cmd_animate)

    p = sub.add_parser("encode", help="encode an existing frame sequence")
    p.add_argument("frames_dir")
    p.add_argument("--out", default="animation.mp4")
    p.add_argument("--codec", default="h264",
                   choices=["h264", "h265", "vp9", "prores", "av1", "qtpng"])
    p.add_argument("--quality", default="high",
                   choices=["draft", "good", "high", "lossless"])
    p.add_argument("--fps", type=int, default=60)
    p.add_argument("--crf", type=int, default=18)
    p.add_argument("--audio", default=None)
    p.add_argument("--cleanup-frames", action="store_true")
    p.set_defaults(fn=cmd_encode)

    p = sub.add_parser("giant", help="progressive/resumable giant still")
    _add_scene_args(p)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--band-rows", type=int, default=512)
    p.add_argument("--out", default="giant.png")
    p.add_argument("--bit-depth", type=int, default=16, choices=(8, 16))
    p.add_argument("--dpi", type=float, default=300.0)
    p.add_argument("--tile-dir", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--mesh", action="store_true",
                   help="shard each band across all devices")
    p.add_argument("--supersample", action="store_true",
                   help="render bands at 2x and box-downsample "
                        "(banded form of export-print --supersample)")
    p.set_defaults(fn=cmd_giant)

    p = sub.add_parser("zoom-path", help="render a deep-zoom preset sequence")
    _add_scene_args(p)
    p.add_argument("--preset-zoom",
                   help="Seahorse|Elephant|Mini (deep_zoom_system presets)")
    p.add_argument("--target-x", type=float, default=None,
                   help="custom zoom target (the deep-zoom panel's typed "
                        "Target X/Y/Zoom, ui_manager.cpp:701-710); "
                        "needs --target-y/--target-zoom too")
    p.add_argument("--target-y", type=float, default=None)
    p.add_argument("--target-zoom", type=float, default=None)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--out-dir", default="zoom_frames")
    p.set_defaults(fn=cmd_zoom_path)

    p = sub.add_parser("sweep", help="batched Julia c-parameter sweep")
    _add_scene_args(p)
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--c-start", default="-0.9,0.1",
                   help="start c as 're,im'")
    p.add_argument("--c-end", default="-0.6,0.3", help="end c as 're,im'")
    p.add_argument("--count", type=int, default=16)
    p.add_argument("--out-dir", default="sweep")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("interactive",
                       help="terminal viewer (live loop on a TTY; REPL "
                            "when piped)")
    _add_scene_args(p)
    p.add_argument("--cols", type=int, default=None)
    p.add_argument("--rows", type=int, default=None)
    p.add_argument("--live", action="store_true",
                   help="force the raw-terminal live loop")
    p.add_argument("--repl", action="store_true",
                   help="force the line-based REPL")
    p.add_argument("--spin", action="store_true",
                   help="start with mandelbulb auto-rotate on "
                        "(vk_engine.cpp:713)")
    p.add_argument("--max-frames", type=int, default=None,
                   help="exit after N drawn frames (for testing)")
    p.add_argument("--fresh", action="store_true",
                   help="don't resume the previous session or persist "
                        "this one (default resumes like the reference's "
                        "imgui.ini)")
    p.add_argument("--gfx", default=None,
                   choices=["auto", "kitty", "iterm", "sixel", "off"],
                   help="pixel-frame protocol for the live session "
                        "(default auto: in-band handshake; kitty/ghostty/"
                        "wezTerm/konsole speak kitty, iTerm2 its own, "
                        "xterm/foot/mlterm sixel; falls back to "
                        "half-block cells)")
    p.set_defaults(fn=cmd_interactive)

    p = sub.add_parser("presets", help="list all preset tables")
    p.set_defaults(fn=cmd_presets)

    p = sub.add_parser("info", help="backend and capability info")
    p.set_defaults(fn=cmd_info)

    for sp in sub.choices.values():
        sp.add_argument("--cpu", action="store_true",
                        default=argparse.SUPPRESS, help=argparse.SUPPRESS)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        import jax

        # must precede first device use; the env var alone is ignored
        # when a TPU plugin is already registered
        jax.config.update("jax_platforms", "cpu")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
