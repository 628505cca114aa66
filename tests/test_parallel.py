"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: xla_force_host_platform_device_count)."""
import os

import jax
import numpy as np
import pytest

from fractalrenderer_tpu import Scene, FractalType, render
from fractalrenderer_tpu.parallel import (make_render_mesh,
                                          render_frames_sharded,
                                          render_giant_still, render_sharded)

# Most tests here run on any device count (a 1-chip mesh is a valid mesh
# and exercises the shard_map path on real hardware — the TPU lane's
# giant_band phase relies on that); only the frames-axis tests genuinely
# need >= 2 devices.
multi_device = pytest.mark.skipif(len(jax.devices()) < 2,
                                  reason="needs multiple (virtual) devices")


@multi_device
def test_mesh_construction():
    m = make_render_mesh()
    assert m.shape["rows"] == len(jax.devices())
    m2 = make_render_mesh(frames=2)
    assert m2.shape["frames"] == 2
    assert m2.shape["rows"] == len(jax.devices()) // 2
    with pytest.raises(ValueError):
        make_render_mesh(frames=3)


def test_sharded_matches_single_device():
    s = Scene(max_iterations=48)
    W, H = 96, 48
    single = np.asarray(render(s, W, H))
    sharded = render_sharded(s, W, H)
    assert sharded.shape == single.shape
    # identical math, identical tiling inside each band → exact equality
    np.testing.assert_array_equal(sharded, single)


def test_sharded_height_not_divisible():
    s = Scene(max_iterations=32)
    W, H = 64, 50  # 50 rows over 8 devices → 7-row padded bands
    single = np.asarray(render(s, W, H))
    sharded = render_sharded(s, W, H)
    assert sharded.shape == (H, W, 3)
    np.testing.assert_array_equal(sharded, single)


def test_sharded_julia():
    s = Scene(fractal_type=FractalType.JULIA, max_iterations=32, zoom=3.0)
    out = render_sharded(s, 64, 32)
    ref = np.asarray(render(s, 64, 32))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("depth", [8, 16])
def test_sharded_quantized_matches_single_bytes(depth):
    # quantize=8/16 moves the clip/scale/round INSIDE the shards (uint
    # out-specs): the sharded fetch carries 1-2 B/channel and the bytes
    # equal the single-chip quantized export exactly.
    from fractalrenderer_tpu.models import common

    s = Scene(max_iterations=48)
    W, H = 96, 48
    out = render_sharded(s, W, H, quantize=depth)
    assert out.dtype == (np.uint8 if depth == 8 else np.uint16)
    ref = np.asarray(common.quantize_image(
        np.asarray(render(s, W, H)), bit_depth=depth))
    np.testing.assert_array_equal(out, ref)


@multi_device
def test_frames_sharded_quantized_bytes():
    scenes = [Scene(max_iterations=32, zoom=z) for z in (3.0, 1.5, 0.8, 0.5)]
    mesh = make_render_mesh(frames=2)
    out = render_frames_sharded(scenes, 64, 32, mesh, quantize=8)
    assert out.dtype == np.uint8
    f32 = render_frames_sharded(scenes, 64, 32, mesh)
    ref = (np.clip(f32, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


@multi_device
def test_frames_sharded():
    scenes = [Scene(max_iterations=32, zoom=z) for z in (3.0, 1.5, 0.8, 0.5)]
    mesh = make_render_mesh(frames=2)
    out = render_frames_sharded(scenes, 64, 32, mesh)
    assert out.shape == (4, 32, 64, 3)
    for i, s in enumerate(scenes):
        # frames batch uses a shared iteration cap; same here (all 32)
        ref = np.asarray(render(s, 64, 32))
        np.testing.assert_array_equal(out[i], ref)


def test_giant_still_resume(tmp_path):
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(max_iterations=24)
    out = str(tmp_path / "big.png")
    info = render_giant_still(s, 96, 80, out, band_rows=32,
                              bit_depth=8, dpi=None)
    assert info["bands"] == 3 and info["rendered"] == 3
    img = read_png(out)
    assert img.shape == (80, 96, 3)
    # resume: all bands skipped
    info2 = render_giant_still(s, 96, 80, out, band_rows=32,
                               bit_depth=8, dpi=None)
    assert info2["skipped"] == 3 and info2["rendered"] == 0
    # band-streamed output equals a monolithic render (flipped at export)
    ref = np.asarray(render(s, 96, 80))[::-1]
    ref8 = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(img, ref8)


def test_giant_still_resume_bad_tiles(tmp_path):
    """Corrupt / wrong-shaped resume tiles re-render instead of aborting."""
    import os

    from fractalrenderer_tpu.utils.png import read_png, write_png

    s = Scene(max_iterations=24)
    out = str(tmp_path / "big.png")
    render_giant_still(s, 96, 80, out, band_rows=32, bit_depth=8, dpi=None)
    ref = read_png(out)
    tile_dir = out + ".tiles"
    # band 0: truncated/garbage bytes (simulates a crash mid-write)
    with open(os.path.join(tile_dir, "band_00000.png"), "wb") as fp:
        fp.write(b"\x89PNG\r\n\x1a\nnot a real png")
    # band 1: decodable but wrong shape (foreign file)
    write_png(os.path.join(tile_dir, "band_00001.png"),
              np.zeros((4, 4, 3), np.uint8), bit_depth=8)
    info = render_giant_still(s, 96, 80, out, band_rows=32,
                              bit_depth=8, dpi=None)
    assert info["rendered"] == 2 and info["skipped"] == 1
    np.testing.assert_array_equal(read_png(out), ref)


def test_giant_still_scene_change_invalidates(tmp_path):
    s1 = Scene(max_iterations=24)
    out = str(tmp_path / "big.png")
    render_giant_still(s1, 64, 40, out, band_rows=20, bit_depth=8, dpi=None)
    s2 = s1.with_(zoom=1.0)
    info = render_giant_still(s2, 64, 40, out, band_rows=20, bit_depth=8,
                              dpi=None)
    assert info["rendered"] == 2  # stale tiles discarded, re-rendered


def test_giant_still_sharded_mesh(tmp_path):
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(max_iterations=24)
    out = str(tmp_path / "mesh.png")
    info = render_giant_still(s, 64, 64, out, band_rows=32, bit_depth=8,
                              dpi=None, use_mesh=True)
    assert info["rendered"] == 2
    img = read_png(out)
    ref = np.asarray(render(s, 64, 64))[::-1]
    ref8 = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(img, ref8)


def test_deep_zoom_sharded_matches_single():
    from fractalrenderer_tpu.deepzoom import orbit as om
    from fractalrenderer_tpu.ops.dd import dd_from_string
    from fractalrenderer_tpu.ops.perturbation import perturbation_fields
    from fractalrenderer_tpu.parallel.tiled import perturbation_fields_sharded

    cx, cy = "-0.743643887037151", "0.13182590420533"
    orb = om.compute_orbit(cx, cy, 64, 401)
    kw = dict(center_x_dd=dd_from_string(cx), center_y_dd=dd_from_string(cy),
              zoom_dd=dd_from_string("1e-8"), max_iter=400,
              float_continuation=False)
    single = perturbation_fields(orb, 64, 48, **kw)
    sharded = perturbation_fields_sharded(orb, 64, 48, **kw)
    np.testing.assert_array_equal(sharded["n"], np.asarray(single["n"]))
    np.testing.assert_array_equal(sharded["zx"], np.asarray(single["zx"]))
    np.testing.assert_array_equal(sharded["glitch"],
                                  np.asarray(single["glitch"]))


def test_deep_zoom_sharded_floatexp_matches_single():
    # the ARBITRARY (scaled/floatexp) tier shards like the f32/dd tiers:
    # the extra exponent operands replicate with the orbit streams and
    # the row bands stay bit-identical to the single-device render
    from fractalrenderer_tpu.deepzoom import orbit as om
    from fractalrenderer_tpu.ops.dd import dd_from_string
    from fractalrenderer_tpu.ops.perturbation import perturbation_fields
    from fractalrenderer_tpu.parallel import make_render_mesh
    from fractalrenderer_tpu.parallel.tiled import perturbation_fields_sharded

    cx, cy = "-0.743643887037151", "0.13182590420533"
    orb = om.compute_orbit(cx, cy, 300, 401)
    kw = dict(center_x_dd=dd_from_string(cx), center_y_dd=dd_from_string(cy),
              max_iter=400, float_continuation=False, rebase=True,
              scaled_delta=True, zoom_frac="1e-40")
    single = perturbation_fields(orb, 64, 32, **kw)
    sharded = perturbation_fields_sharded(orb, 64, 32,
                                          mesh=make_render_mesh(), **kw)
    np.testing.assert_array_equal(sharded["n"], np.asarray(single["n"]))
    np.testing.assert_array_equal(sharded["zx"], np.asarray(single["zx"]))
    assert not (np.asarray(sharded["want"]) > 0.5).any()


@pytest.mark.parametrize("fam_kw,cx,cy", [
    (dict(deep_zoom_julia=True, julia_c_real=-0.7, julia_c_imag=0.27015),
     "-0.2", "0.65"),
    (dict(deep_zoom_ship=True), "-1.7443359374999999", "-0.017451171875"),
    (dict(deep_zoom_phoenix=True), "-0.1465", "0.2115"),
], ids=["julia", "ship", "phoenix"])
def test_deep_zoom_families_sharded_match_single(fam_kw, cx, cy):
    # every beyond-reference deep-zoom family renders over the row-band
    # mesh bit-identically to the single-device path
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.parallel import make_render_mesh
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x=cx, hp_center_y=cy, hp_zoom="1e-9",
              max_iterations=300, **fam_kw)
    n1, zx1, *_ = deep_zoom.render_fields(s, 32, 16)
    n2, zx2, *_ = deep_zoom.render_fields(s, 32, 16,
                                          mesh=make_render_mesh())
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(zx1), np.asarray(zx2))


def test_deep_zoom_model_sharded():
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.parallel import make_render_mesh
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.DEEP_ZOOM,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=600, use_perturbation=True)
    mesh = make_render_mesh()
    n_s, zx_s, _, _, info_s = deep_zoom.render_fields(s, 48, 32, mesh=mesh)
    n_1, zx_1, _, _, info_1 = deep_zoom.render_fields(s, 48, 32)
    np.testing.assert_array_equal(n_s, n_1)
    np.testing.assert_array_equal(zx_s, zx_1)
    assert info_s["references_used"] == info_1["references_used"]


def test_deep_zoom_mesh_device_quantized_bytes():
    # The mesh-sharded deep-zoom export keeps fields device-resident
    # (keep_device), colors + quantizes the sharded planes on device, and
    # produces the single-chip path's exact bytes — no f32 host tail.
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.parallel import make_render_mesh

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300)
    mesh = make_render_mesh()
    img_m, info = deep_zoom.render(s, 48, 32, mesh=mesh, quantize=16,
                                   return_info=True)
    assert info["fields_on_device"] is True  # the host tail is gone
    assert img_m.dtype == np.uint16
    img_1 = deep_zoom.render(s, 48, 32, quantize=16)
    np.testing.assert_array_equal(img_m, img_1)


def test_mandelbulb_sharded_matches_single():
    # The bulb joins the row-band decomposition: per-lane predicated
    # march/DE updates make results independent of tile grouping, so the
    # 8-band sharded render must equal the single-device one exactly.
    from fractalrenderer_tpu.models import mandelbulb
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=12)
    W, H = 64, 48
    single = np.asarray(mandelbulb.render(s, W, H))
    sharded = mandelbulb.render_sharded(s, W, H)
    assert sharded.shape == single.shape
    # march fields are bit-identical across band decompositions (see
    # ops/bulb_kernel esc recording); the XLA shading epilogue compiles
    # with different fusion orders under shard_map, so allow ulp-level
    # color drift there
    np.testing.assert_allclose(sharded, single, atol=1e-4)
    assert (np.abs(sharded - single) > 1e-6).mean() < 0.01


def test_mandelbulb_sharded_xla_path():
    from fractalrenderer_tpu.models import mandelbulb
    from fractalrenderer_tpu.scene import FractalType, Scene

    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=10)
    W, H = 48, 32
    single = np.asarray(mandelbulb.render(s, W, H, pallas_march=False))
    sharded = mandelbulb.render_sharded(s, W, H, pallas_march=False)
    np.testing.assert_array_equal(sharded, single)


@multi_device
def test_animation_renderer_mesh_equals_single(tmp_path):
    # AnimationRenderer(mesh=...) shards frame batches over the
    # ('frames','rows') mesh; frames must be bit-identical to the
    # single-device batched path.
    import os

    from fractalrenderer_tpu.anim.keyframes import Animation, Keyframe
    from fractalrenderer_tpu.anim.renderer import AnimationRenderer
    from fractalrenderer_tpu.parallel import make_render_mesh
    from fractalrenderer_tpu.scene import Scene
    from fractalrenderer_tpu.utils.png import read_png

    a = Animation(duration=6.0, target_fps=1, export_width=64,
                  export_height=32)
    a.keyframes.append(Keyframe(0.0, Scene(max_iterations=24, zoom=2.5)))
    a.keyframes.append(Keyframe(6.0, Scene(max_iterations=48, zoom=0.4)))
    single_dir = str(tmp_path / "single")
    mesh_dir = str(tmp_path / "mesh")
    assert AnimationRenderer(batch_size=4).start_render(a, single_dir)
    mesh = make_render_mesh(frames=2)
    assert AnimationRenderer(batch_size=4, mesh=mesh).start_render(
        a, mesh_dir)
    frames = sorted(os.listdir(single_dir))
    assert frames == sorted(os.listdir(mesh_dir)) and len(frames) == 6
    for f in frames:
        np.testing.assert_array_equal(
            read_png(os.path.join(single_dir, f)),
            read_png(os.path.join(mesh_dir, f)))


def test_giant_still_mandelbulb(tmp_path):
    # The bulb joins the giant-still exporter through the same
    # (dyn, row0) band pipeline as the 2D families — banded output is
    # bit-identical to a monolithic render (per-lane predicated updates
    # make the march independent of tile grouping).
    from fractalrenderer_tpu.models import mandelbulb
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.MANDELBULB, max_iterations=24)
    out = str(tmp_path / "bulb.png")
    info = render_giant_still(s, 64, 48, out, band_rows=16, bit_depth=8,
                              dpi=None)
    assert info["rendered"] == 3
    img = read_png(out)
    ref = np.asarray(mandelbulb.render(s, 64, 48))[::-1]
    ref8 = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(img, ref8)


def test_giant_still_deep_zoom(tmp_path):
    # Deep-zoom giants: one reference orbit serves every band
    # (render_fields row_band windows the full-image mapping), so the
    # streamed 16-bit PNG equals a monolithic deep-zoom render exactly.
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300)
    out = str(tmp_path / "deep.png")
    info = render_giant_still(s, 48, 40, out, band_rows=16, bit_depth=16,
                              dpi=None)
    assert info["rendered"] == 3
    img = read_png(out)
    assert img.shape == (40, 48, 3)
    ref = np.asarray(deep_zoom.render(s, 48, 40))[::-1]
    ref16 = (np.clip(ref, 0, 1) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(img, ref16)


def test_giant_still_deep_zoom_mesh(tmp_path):
    # use_mesh composes with deep-zoom banding: the giant band's global
    # row offset and the per-device sub-bands add up inside
    # perturbation_fields_sharded — still bit-identical.
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300)
    plain = str(tmp_path / "deep.png")
    meshed = str(tmp_path / "deep_mesh.png")
    render_giant_still(s, 48, 32, plain, band_rows=16, bit_depth=16,
                       dpi=None)
    render_giant_still(s, 48, 32, meshed, band_rows=16, bit_depth=16,
                       dpi=None, use_mesh=True)
    np.testing.assert_array_equal(read_png(plain), read_png(meshed))


def test_giant_still_supersample(tmp_path):
    # Banded 2x-supersampled export == downsampling a monolithic 2x
    # render (the downsample expression is bit-identical f32 on both
    # paths), for both the plain and mesh-sharded band producers.
    from fractalrenderer_tpu.utils.image import downsample2x
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(max_iterations=24)
    out = str(tmp_path / "ss.png")
    render_giant_still(s, 64, 48, out, band_rows=16, bit_depth=8,
                       dpi=None, supersample=True)
    ref = downsample2x(np.asarray(render(s, 128, 96)))[::-1]
    ref8 = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(read_png(out), ref8)

    out2 = str(tmp_path / "ss_mesh.png")
    render_giant_still(s, 64, 48, out2, band_rows=16, bit_depth=8,
                       dpi=None, supersample=True, use_mesh=True)
    np.testing.assert_array_equal(read_png(out2), ref8)


def test_giant_still_supersample_deep_zoom(tmp_path):
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.utils.image import downsample2x
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300)
    out = str(tmp_path / "ssdeep.png")
    render_giant_still(s, 32, 24, out, band_rows=8, bit_depth=16,
                       dpi=None, supersample=True)
    ref = downsample2x(np.asarray(deep_zoom.render(s, 64, 48)))[::-1]
    ref16 = (np.clip(ref, 0, 1) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(read_png(out), ref16)


def test_export_print_banded_delegation(tmp_path, monkeypatch):
    # Oversized print exports stream through the banded exporter; the
    # delegated output must equal the one-pass path bit-for-bit.
    from fractalrenderer_tpu import cli
    from fractalrenderer_tpu.utils.png import read_png

    one = str(tmp_path / "one.png")
    banded = str(tmp_path / "banded.png")
    argv = ["export-print", "--width", "96", "--height", "64",
            "--iters", "32", "--supersample", "--downsample"]
    assert cli.main(argv + ["--out", one]) == 0
    monkeypatch.setattr(cli, "_BANDED_EXPORT_PIXELS", 1000)
    assert cli.main(argv + ["--out", banded]) == 0
    np.testing.assert_array_equal(read_png(one), read_png(banded))
    # delegated export-print cleans up its resume tiles on success
    assert not os.path.exists(banded + ".tiles")


def test_giant_still_validates_scene(tmp_path):
    # render_giant_still repairs degenerate scenes exactly like the
    # one-pass renderers (compute_effect_manager.h:335-345) — the banded
    # and monolithic forms of the same export must agree
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(max_iterations=24, zoom=0.0)  # degenerate: repaired to 2.5
    out = str(tmp_path / "v.png")
    render_giant_still(s, 64, 40, out, band_rows=20, bit_depth=8, dpi=None)
    ref = np.asarray(render(s, 64, 40))[::-1]  # models.render validates
    ref8 = (np.clip(ref, 0, 1) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(read_png(out), ref8)


def test_giant_still_geometry_fuzz(tmp_path):
    # Random geometries (odd sizes, non-divisible bands, supersample)
    # across the device band producers must equal the monolithic render
    # exactly — guards the band/downsample index arithmetic.
    from fractalrenderer_tpu.utils.image import downsample2x
    from fractalrenderer_tpu.utils.png import read_png

    rng = np.random.default_rng(20260817)
    scenes = {
        "mandelbrot": Scene(max_iterations=16),
        "julia": Scene(fractal_type=FractalType.JULIA, max_iterations=16),
        "mandelbulb": Scene(fractal_type=FractalType.MANDELBULB,
                            max_iterations=12),
    }
    for k in range(6):
        name = ("mandelbrot", "julia", "mandelbulb")[k % 3]
        s = scenes[name]
        w = int(rng.integers(20, 70))
        h = int(rng.integers(20, 70))
        band = int(rng.integers(7, 40))
        ss = bool(rng.integers(0, 2))
        out = str(tmp_path / f"f{k}.png")
        render_giant_still(s, w, h, out, band_rows=band, bit_depth=8,
                           dpi=None, supersample=ss, resume=False)
        ref = np.asarray(render(s, w * 2 if ss else w, h * 2 if ss else h))
        if ss:
            ref = downsample2x(ref)
        ref8 = (np.clip(ref[::-1], 0, 1) * 255 + 0.5).astype(np.uint8)
        np.testing.assert_array_equal(read_png(out), ref8,
                                      err_msg=f"{name} {w}x{h} band={band} "
                                              f"ss={ss}")


def test_giant_still_deep_zoom_scaled_julia(tmp_path):
    # The banded giant composes with the floatexp (ARBITRARY) tier and a
    # beyond-reference family: a deep-zoom JULIA at 1e-40 streamed in
    # bands equals the monolithic render exactly.
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              deep_zoom_julia=True, julia_c_real=-0.7, julia_c_imag=0.27015,
              hp_center_x="1.4842927481401905",
              hp_center_y="-0.1372305142501787",
              hp_zoom="1e-40", max_iterations=200)
    out = str(tmp_path / "dj.png")
    info = render_giant_still(s, 24, 18, out, band_rows=8, bit_depth=16,
                              dpi=None)
    assert info["rendered"] == 3
    ref = np.asarray(deep_zoom.render(s, 24, 18))[::-1]
    ref16 = (np.clip(ref, 0, 1) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(read_png(out), ref16)


def test_giant_still_deep_zoom_spp(tmp_path):
    # samples_per_pixel > 1 deep-zoom giants use banded STACKED AA (one
    # kernel call per band for all spp^2 samples) and must equal the
    # monolithic stacked render exactly.
    from fractalrenderer_tpu.models import deep_zoom
    from fractalrenderer_tpu.utils.png import read_png

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300, samples_per_pixel=2)
    out = str(tmp_path / "spp.png")
    render_giant_still(s, 32, 24, out, band_rows=8, bit_depth=16,
                       dpi=None)
    ref = np.asarray(deep_zoom.render(s, 32, 24))[::-1]
    ref16 = (np.clip(ref, 0, 1) * 65535 + 0.5).astype(np.uint16)
    np.testing.assert_array_equal(read_png(out), ref16)


def test_stacked_aa_sharded_matches_single():
    # aa_spp x mesh: each device stacks the spp^2 segments of its OWN
    # row band (self-contained stacked map via Q_AROW0), so sharded
    # supersampled deep zoom is bit-identical to the single-device
    # stacked render.
    from fractalrenderer_tpu.models import deep_zoom

    s = Scene(fractal_type=FractalType.DEEP_ZOOM, use_perturbation=True,
              hp_center_x="-0.743643887037151",
              hp_center_y="0.13182590420533",
              hp_zoom="1e-8", max_iterations=300)
    W, H = 32, 24
    n1, zx1, zy1, _, _ = deep_zoom.render_fields(s, W, H, aa_spp=2)
    n2, zx2, zy2, _, _ = deep_zoom.render_fields(s, W, H, aa_spp=2,
                                                 mesh=make_render_mesh())
    assert n2.shape == (4, H, W)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(zx1, zx2)
    np.testing.assert_array_equal(zy1, zy2)
