"""Multi-chip sharded rendering and progressive giant stills.

BASELINE config #5: a 16K×16K still sharded across a TPU mesh with a
gather-free tile decomposition.  Each device owns a contiguous row band of
the image (shard_map over the 'rows' axis); the escape kernel receives the
band's global first row and the full-image mapping height, so no device
reads anything another device wrote — the only cross-chip traffic is the
final (optional) assembly of the output array.

Giant stills additionally stream through the host: the image is rendered in
row bands, each band written as a PNG tile on disk; an interrupted export
resumes by skipping completed tiles; the assembly pass concatenates tiles
into one 16-bit PNG without ever materializing the full image
(utils/png.PNGWriter streams scanlines).  This replaces the reference's
single 4GB-staging-buffer print export (vk_engine.cpp:1939-2003) which
cannot exceed one GPU allocation.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import common
from ..scene import Scene
from ..utils import png
from ..utils.image import to_export_orientation
from .mesh import make_render_mesh, pad_to_multiple

_FAMILY = common.family_map()


# Stacked deep-zoom AA budget for giant bands (see produce_band): the
# largest stacked map (spp^2 * band_rows * width pixels) a band may
# materialize on device before falling back to sequential offsets.
_STACKED_BAND_PIXELS = 1 << 25


def _quantize_host(x: np.ndarray, bit_depth: int) -> np.ndarray:
    """Identical clip/scale/round-truncate to the on-device ``_quantize``
    in render_giant_still (and utils.png._prepare_rows), for bands whose
    producer returns host f32 (the deep-zoom path)."""
    x = np.clip(x, 0.0, 1.0)
    if bit_depth == 8:
        return (x * 255.0 + 0.5).astype(np.uint8)
    return (x * 65535.0 + 0.5).astype(np.uint16)


def render_sharded(scene: Scene, width: int, height: int,
                   mesh: Optional[Mesh] = None,
                   quantize: int = 0) -> np.ndarray:
    """Render one frame with its rows sharded across the mesh's 'rows' axis
    (gather-free: each device computes and owns its band).

    ``quantize``: 8/16 quantizes INSIDE the shard (uint8/16 out-specs, the
    PNG writer's exact clip/scale/round) so the per-device fetch moves 1-2
    B per channel instead of 4 — byte-identical files to the single-chip
    quantized path."""
    from ..utils.diag import validate_scene

    scene = validate_scene(scene)  # parity with models.render dispatch
    if mesh is None:
        mesh = make_render_mesh()
    n_rows = mesh.shape["rows"]
    fam, conv, clamp = _FAMILY[scene.fractal_type]
    h_pad = pad_to_multiple(height, n_rows)
    band_h = h_pad // n_rows
    cfg = common.scene_static_cfg(scene, width, height, fam, conv, clamp)
    band_fn = common.band_render_fn(cfg, band_h, height)
    dyn = {k: jnp.float32(v) for k, v in common.scene_dyn_params(scene).items()}

    def shard_body(dyn):
        ridx = jax.lax.axis_index("rows")
        row0 = (ridx * band_h).astype(jnp.float32)
        out = band_fn(dyn, row0)
        if quantize:
            out = common.quantize_image(out, bit_depth=quantize)
        return out

    fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(),), out_specs=P("rows"),
        check_vma=False))
    out = fn(dyn)
    return np.asarray(out)[:height]


def render_frames_sharded(scenes, width: int, height: int,
                          mesh: Optional[Mesh] = None,
                          cap: Optional[int] = None,
                          quantize: int = 0) -> np.ndarray:
    """Batch of frames sharded over ('frames', 'rows'): data-parallel frames
    × spatial row bands (BASELINE configs #2/#3 at multi-chip scale).  All
    scenes must share a static config; iteration counts may differ.
    ``cap`` overrides the compiled iteration bound (callers rendering many
    chunks of one sequence pass the sequence-wide max so every chunk hits
    the same compile).
    ``quantize``: 8/16 quantizes INSIDE each shard (uint8/16 out-specs —
    the PNG writer's expression) so the batch fetch moves uint instead of
    f32 on the link-bound sharded animate path."""
    if mesh is None:
        mesh = make_render_mesh(frames=1)
    n_frames = mesh.shape["frames"]
    n_rows = mesh.shape["rows"]
    fam, conv, clamp = _FAMILY[scenes[0].fractal_type]
    if cap is None:
        cap = max(s.max_iterations for s in scenes)
    import dataclasses

    cfg = dataclasses.replace(
        common.scene_static_cfg(scenes[0], width, height, fam, conv, clamp),
        max_iter=cap)
    nf_pad = pad_to_multiple(len(scenes), n_frames)
    h_pad = pad_to_multiple(height, n_rows)
    band_h = h_pad // n_rows
    band_fn = common.band_render_fn(cfg, band_h, height)

    dyns = [common.scene_dyn_params(s) for s in scenes]
    dyns += [dyns[-1]] * (nf_pad - len(dyns))
    batch = {k: jnp.asarray([d[k] for d in dyns], jnp.float32)
             for k in dyns[0]}

    def shard_body(batch):
        ridx = jax.lax.axis_index("rows")
        row0 = (ridx * band_h).astype(jnp.float32)
        # each frame-shard renders its local frames' band sequentially
        out = jax.lax.map(lambda d: band_fn(d, row0), batch)
        if quantize:
            out = common.quantize_image(out, bit_depth=quantize)
        return out

    fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("frames"),), out_specs=P("frames", "rows"),
        check_vma=False))
    out = fn(batch)
    return np.asarray(out)[:len(scenes), :height]


def perturbation_fields_sharded(orbit, width, height, *, mesh=None,
                                keep_device: bool = False, **pert_kw):
    """Row-band-sharded perturbation deep zoom: the reference orbit is
    replicated (it is small and read-only); each device computes its band's
    deltas — still gather-free.  Same signature/result as
    ops.perturbation.perturbation_fields.

    ``keep_device``: return the field planes as (row-sharded) DEVICE
    arrays instead of gathering to numpy, so callers can color + quantize
    on device and fetch only uint8/16 RGB — the mesh-sharded deep-zoom
    export was otherwise host-tailed at 12+ B/px of f32 fields.  Only the
    plain (non-stacked) path with an exact shard split honors it; other
    shapes fall back to the host return (callers detect via isinstance)."""
    import numpy as _np

    from ..ops import perturbation as pert

    if mesh is None:
        mesh = make_render_mesh()
    n_rows = mesh.shape["rows"]
    h_pad = pad_to_multiple(height, n_rows)
    band_h = h_pad // n_rows
    # A giant-still band render (models/deep_zoom.render_fields row_band)
    # may itself be a window of a taller image: its global row offset and
    # the full map height compose with the per-device sub-banding here.
    row0_base = float(pert_kw.pop("row0", 0.0))
    map_h = int(pert_kw.pop("map_height", height))
    aa_spp = int(pert_kw.pop("aa_spp", 1))

    # Build the replicated operands once on host.  With aa_spp each
    # device renders the spp^2 segment STACK of its own row band (the
    # Q_AROW0 banded mapping — ops/perturbation.py), so supersampled
    # deep zooms shard too; otherwise the per-device window is plain and
    # Q_ROW0 is patched.
    operands, call_kw = pert.perturbation_fields(
        orbit, width, band_h, map_height=map_h, row0=row0_base,
        _build_only=True,
        **({"aa_spp": aa_spp} if aa_spp > 1 else {}), **pert_kw)

    rebase = "max_passes" in call_kw
    aa_stack = call_kw.get("aa_stack")

    def shard_body(params, ore, oim, om2, orel, oiml, orex, oimx):
        ridx = jax.lax.axis_index("rows")
        off = jnp.float32(row0_base) + (ridx * band_h).astype(jnp.float32)
        # stacked maps are self-contained (Q_ROW0 stays 0); the device's
        # band start enters only the pixel mapping via Q_AROW0
        q = pert.Q_AROW0 if aa_stack is not None else pert.Q_ROW0
        p2 = params.at[0, q].set(off)
        if rebase:
            # in-kernel form appends the per-tile rounds plane — only
            # the max is needed on the sharded path
            n, zx, zy, g, want, k = pert._pert_rebase_call(
                p2, ore, oim, om2, orel, oiml, orex, oimx,
                **call_kw)[:6]
            return n, zx, zy, g, want, jnp.reshape(k, (1, 1))
        return pert._pert_call(p2, ore, oim, om2, orel, oiml, orex, oimx,
                               **call_kw)

    n_out = 6 if rebase else 4
    fn = jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(),) * 8,
        out_specs=(P("rows"),) * n_out,
        check_vma=False))
    outs = fn(*operands)

    if keep_device and aa_stack is None and h_pad == height:
        # exact shard split: no padding rows to trim, so the sharded
        # planes can stay on device verbatim (elementwise coloring /
        # quantization preserves the row sharding; only uint crosses)
        res = {"n": outs[0], "zx": outs[1], "zy": outs[2],
               "glitch": outs[3]}
        if rebase:
            res["want"] = outs[4]
            res["passes"] = int(_np.asarray(outs[5]).max())
        return res

    if aa_stack is not None:
        spp_, seg_h_, aa_h_, _fullh = aa_stack  # aa_h_ == band_h

        def field(a):
            # device-concat of per-band stacks -> (S, height, W): split
            # devices, drop each segment's tile padding, reorder so the
            # sample axis is outermost, rejoin the bands
            a = _np.asarray(a).reshape(n_rows, spp_ * spp_, seg_h_, width)
            a = a.transpose(1, 0, 2, 3)[:, :, :aa_h_]
            return a.reshape(spp_ * spp_, n_rows * aa_h_, width)[:, :height]
    else:
        def field(a):
            return _np.asarray(a)[:height]

    res = {"n": field(outs[0]), "zx": field(outs[1]),
           "zy": field(outs[2]), "glitch": field(outs[3])}
    if rebase:
        res["want"] = field(outs[4])
        res["passes"] = int(_np.asarray(outs[5]).max())
    return res


# ---------------------------------------------------------------------------
# Progressive / resumable giant stills
# ---------------------------------------------------------------------------

def render_giant_still(scene: Scene, width: int, height: int, out_path: str,
                       band_rows: int = 512, tile_dir: Optional[str] = None,
                       resume: bool = True, bit_depth: int = 16,
                       dpi: Optional[float] = 300.0,
                       mesh: Optional[Mesh] = None,
                       use_mesh: bool = False,
                       compress_level: int = 3,
                       supersample: bool = False,
                       extra_metadata: Optional[Dict] = None,
                       orbit_cache: Optional[Dict] = None,
                       keep_tiles: bool = True,
                       progress_cb=None) -> Dict:
    """Stream a huge still to disk in row bands (config #5).

    Each band is rendered (optionally mesh-sharded), written as
    ``band_%05d.png`` in ``tile_dir``, and finally assembled into one PNG by
    streaming scanlines — peak host memory is one band.  With ``resume``,
    completed bands are skipped on restart (manifest.json tracks geometry).

    Every fractal family is supported, matching the reference's
    print-export of whatever fractal is active (vk_engine.cpp:1796-2232):
    the 2D escape families and the mandelbulb render device-side through
    their shared ``(dyn, row0)`` band pipelines; DEEP_ZOOM scenes stream
    through ``models.deep_zoom.render_fields(row_band=...)`` with one
    reference orbit shared across all bands.

    ``supersample``: render each band at 2x and 2x2-box-downsample before
    quantizing — the banded form of export-print's --supersample
    --downsample (bit-identical to downsampling a monolithic 2x render),
    for print exports too large to materialize at 2x in one pass.
    """
    from ..utils.diag import validate_scene

    # Repair degenerate scenes exactly like the one-pass renderers do
    # (compute_effect_manager.h:335-345) — export-print's banded
    # delegation must not behave differently above the size threshold.
    scene = validate_scene(scene)
    tile_dir = tile_dir or out_path + ".tiles"
    os.makedirs(tile_dir, exist_ok=True)
    manifest_path = os.path.join(tile_dir, "manifest.json")
    manifest = {"width": width, "height": height, "band_rows": band_rows,
                "bit_depth": bit_depth, "supersample": bool(supersample),
                "scene": scene.to_dict()}
    if resume and os.path.exists(manifest_path):
        try:
            old = json.load(open(manifest_path))
        except ValueError:
            old = {}  # truncated by a crash mid-write — treat as stale
        if {k: old.get(k) for k in manifest} != manifest:
            # stale tiles from a different job (other geometry, scene, or
            # bit depth — resumed tiles feed the final PNG verbatim, so a
            # depth mismatch would corrupt it) — start over
            for f in os.listdir(tile_dir):
                os.remove(os.path.join(tile_dir, f))
    # atomic write: a crash mid-dump must not wedge later resumes
    tmp_manifest = manifest_path + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp_manifest, manifest_path)

    from ..scene import FractalType

    n_bands = -(-height // band_rows)
    rendered = 0
    skipped = 0
    ft = scene.fractal_type
    deep = ft == FractalType.DEEP_ZOOM
    # Supersampled exports render bands at 2x geometry and box-downsample
    # back to output rows before quantizing; every row index below is in
    # OUTPUT rows — the producers scale by ``ss`` where they touch the
    # render-resolution map.
    ss = 2 if supersample else 1
    r_w, r_h, r_band = width * ss, height * ss, band_rows * ss

    def _ds2_jnp(big):
        # bit-identical expression to utils.image.downsample2x (f32 adds
        # in the same order, then * 0.25)
        return (big[0::2, 0::2] + big[1::2, 0::2] + big[0::2, 1::2]
                + big[1::2, 1::2]) * jnp.float32(0.25)

    if deep:
        # Deep-zoom giants: one reference orbit (orbit_cache) serves every
        # band; render_fields(row_band=...) windows the full-image mapping
        # so each band is bit-identical to the same rows of a full render.
        # The producer is host-driven (multi-pass rebase + host coloring),
        # so bands return as ready-quantized numpy instead of device
        # arrays — the streaming/emit pipeline below is shared.
        if use_mesh and mesh is None:
            mesh = make_render_mesh()
        from ..models import deep_zoom as _dz
        from ..ops.coloring import ColorParams

        dz_scene = scene  # validated above
        spp = max(int(dz_scene.samples_per_pixel), 1)
        dz_cp = ColorParams(
            max_iterations=dz_scene.max_iterations,
            bailout=dz_scene.bailout,
            palette_mode=dz_scene.palette_mode,
            color_offset=dz_scene.color_offset,
            color_scale=dz_scene.color_scale)
        dz_cache: Dict = {} if orbit_cache is None else orbit_cache

        # Stacked AA multiplies the band's device footprint by spp^2
        # (the kernel materializes n/zx/zy/glitch/want + rebase state at
        # the stacked height) — the giant exporter exists because the
        # image does NOT fit at once, so fall back to the sequential
        # offset loop when the stacked map would exceed the budget
        # (~33M px * ~10 f32 arrays ~= 1.3 GB HBM).
        stacked = (spp > 1 and (spp & (spp - 1)) == 0 and not use_mesh
                   and spp * spp * r_band * r_w <= _STACKED_BAND_PIXELS)

        def produce_band(row0: int):
            # Clamp the last band to the image bottom: rows past it would
            # be fully iterated (and could even trigger host HP-fallback
            # orbits for off-image pixels) only to be thrown away.  The
            # clamp stays downsample-pair-aligned (r_h and row0*ss are
            # both even at 2x).
            bh = min(r_band, r_h - row0 * ss)
            # keep_device: bands color, average, downsample, and quantize
            # ON DEVICE, fetching only the final uint8/uint16 band (2-6
            # B/px instead of 16·spp² B/px of field planes — 48 B per
            # OUTPUT pixel when supersampled) — the giant exporter is
            # transfer-bound over thin links.  HP-fallback bands (numpy
            # return) run the identical host expressions
            # (downsample2x/_quantize_host are the device ops' bit-exact
            # counterparts).  Banded output equals the monolithic
            # deep_zoom.render whenever no band needs the HP fallback
            # (guaranteed under rebasing, barring max_passes exhaustion);
            # a fallback band colors on host, which agrees with the
            # device colorer within the 1e-5 color contract (±1 LSB at
            # 16 bit) rather than bit-for-bit.
            if stacked:
                # all spp^2 subpixel samples of the band in ONE kernel
                # call sharing the orbit operands and rebase passes
                # (bit-identical to the sequential offsets, tested)
                n, zx, zy, _g, _i = _dz.render_fields(
                    dz_scene, r_w, r_h, orbit_cache=dz_cache,
                    row_band=(row0 * ss, bh), aa_spp=spp,
                    keep_device=True)
                avg, on_dev = _dz.color_stacked_samples(n, zx, zy, dz_cp,
                                                        spp * spp)
            else:
                accu = _dz.SampleAccumulator(dz_cp)
                for sy in range(spp):
                    for sx in range(spp):
                        off = ((sx / spp, sy / spp) if spp > 1
                               else (0.0, 0.0))
                        n, zx, zy, _g, _i = _dz.render_fields(
                            dz_scene, r_w, r_h, offset=off,
                            orbit_cache=dz_cache,
                            row_band=(row0 * ss, bh),
                            mesh=mesh if use_mesh else None,
                            keep_device=True)
                        accu.add(n, zx, zy)
                avg, on_dev = accu.average(spp * spp)
            if not on_dev or (use_mesh and supersample):
                # HP-fallback bands color on host; supersampled MESH
                # bands also take the host tail (the strided 2x
                # downsample across row shards would add halo comms).
                # Plain mesh bands quantize on device below — the
                # elementwise colorer/quantizer preserve the row
                # sharding, so the link carries 2-6 B/px of uint
                # instead of 12 B/px of f32 RGB.
                avg = np.asarray(avg)
                if supersample:
                    from ..utils.image import downsample2x

                    avg = downsample2x(avg)
                return _quantize_host(avg, bit_depth)
            if supersample:
                avg = _ds2_jnp(avg)
            return np.ascontiguousarray(_quantize(avg))
    else:
        if ft == FractalType.MANDELBULB:
            from ..models import mandelbulb as _mb

            def make_band_fn(bh):
                return _mb.band_render_fn(scene, r_w, bh, r_h)

            dyn_host = _mb.dyn_params(scene)
        else:
            fam, conv, clamp = _FAMILY[ft]
            cfg = common.scene_static_cfg(scene, r_w, r_h, fam, conv,
                                          clamp)

            def make_band_fn(bh):
                return common.band_render_fn(cfg, bh, r_h)

            dyn_host = common.scene_dyn_params(scene)

        if use_mesh:
            if mesh is None:
                mesh = make_render_mesh()
            n_rows = mesh.shape["rows"]
            sub_h = pad_to_multiple(r_band, n_rows) // n_rows
            band_fn = make_band_fn(sub_h)

            def shard_body(dyn, band_row0):
                ridx = jax.lax.axis_index("rows")
                row0 = band_row0 + (ridx * sub_h).astype(jnp.float32)
                return band_fn(dyn, row0)

            inner = jax.shard_map(
                shard_body, mesh=mesh,
                in_specs=(P(), P()), out_specs=P("rows"),
                check_vma=False)
        else:
            inner = make_band_fn(r_band)

        if supersample:
            # row0 arrives in output rows; the render map is 2x
            def band_out(dyn, row0):
                return _ds2_jnp(inner(dyn, row0 * jnp.float32(2.0))[:r_band])

            sharded = jax.jit(band_out)
        else:
            sharded = jax.jit(inner)

        dyn = {k: jnp.float32(v) for k, v in dyn_host.items()}

    # Fully pipelined export: bands render in FINAL scanline order
    # (reversed — export orientation is a vertical flip), dispatching band
    # k+1 and starting its async device->host copy before blocking on band
    # k; resume tiles AND the final PNG's IDAT chunks deflate in worker
    # threads (pigz-style independently-deflated full-flush chunks,
    # utils.png.ParallelPNGWriter) while later bands render.  End-to-end
    # wall time tracks max(render+transfer, deflate/threads) instead of
    # render + transfer + tile-deflate + assembly-re-deflate — the round-1
    # pipeline re-compressed the entire image single-threaded in a
    # separate assembly pass.  Replaces the reference's synchronous
    # single-staging-buffer export (vk_engine.cpp:1939-2003).
    import concurrent.futures as _futures

    def encode_band(bb, band_np, tile_path):
        # write tiles atomically so a crash never leaves a bad tile.
        # Tiles are TRANSIENT resume artifacts (deleted after a
        # successful assembly unless keep_tiles): level-1 deflate — the
        # level-6 default was a second full-image deflate pass that a
        # 1-CPU bench host serializes against the final IDAT's
        # (config5 audit, round 5)
        tmp = tile_path + ".tmp"
        png.write_png(tmp, band_np, bit_depth=bit_depth,
                      compress_level=1)
        os.replace(tmp, tile_path)

    # Quantize on DEVICE to the target bit depth (identical clip/scale/
    # truncate to utils.png._prepare_rows) so the link carries uint16/uint8
    # instead of f32 RGB — halves (or quarters) the per-band transfer on
    # the link-bound path.
    @jax.jit
    def _quantize(x):
        x = jnp.clip(x, 0.0, 1.0)
        if bit_depth == 8:
            return (x * 255.0 + 0.5).astype(jnp.uint8)
        return (x * 65535.0 + 0.5).astype(jnp.uint16)

    meta = {"Software": "fractalrenderer_tpu (giant still)",
            **scene.metadata_summary(), **(extra_metadata or {})}
    out_tmp = out_path + ".tmp"
    done_ct = 0
    with open(out_tmp, "wb") as fp, \
            png.ParallelPNGWriter(fp, width, height, bit_depth=bit_depth,
                                  channels=3, metadata=meta, dpi=dpi) as w, \
            _futures.ThreadPoolExecutor(max_workers=4) as pool:
        inflight = []       # (band, device array, row0, tile path)
        tile_futures = []
        final_q = []        # (n_rows, deflate future, raw bytes) in order
        fetch_s = 0.0       # host time BLOCKED on D2H fetches — with the
        # async copy issued at dispatch, wall ≈ fetch_s on a link-bound
        # export; bench_all config5 records it next to the link probe

        def flush_final(block=False):
            while final_q and (block or final_q[0][1].done()):
                n_rows_, fut_, raw_ = final_q.pop(0)
                w.write_deflated(n_rows_, fut_.result(), raw_)

        def emit(band_np):
            # band_np is in render orientation; the final PNG wants the
            # export flip.  Called strictly in final scanline order.
            nonlocal done_ct
            rows_final = to_export_orientation(band_np)
            raw = png.band_raw_bytes(rows_final, bit_depth)
            final_q.append((rows_final.shape[0],
                            pool.submit(png.deflate_chunk, raw,
                                        compress_level), raw))
            flush_final()
            done_ct += 1
            if progress_cb:
                progress_cb(done_ct, n_bands)

        def drain_one():
            nonlocal rendered, fetch_s
            bb, arr, r0, tile_path = inflight.pop(0)
            t0 = time.perf_counter()
            band_np = np.asarray(arr)[:min(band_rows, height - r0)]
            fetch_s += time.perf_counter() - t0
            tile_futures.append(
                pool.submit(encode_band, bb, band_np, tile_path))
            rendered += 1
            emit(band_np)

        for b in reversed(range(n_bands)):  # final scanline order
            tile_path = os.path.join(tile_dir, f"band_{b:05d}.png")
            if resume and os.path.exists(tile_path):
                # an unreadable or wrong-shaped tile (truncated write,
                # foreign file) must re-render its band, not abort the
                # whole export with a decode error
                try:
                    tile = png.read_png(tile_path)
                except Exception:
                    tile = None
                want_rows = min(band_rows, height - b * band_rows)
                want_dt = np.uint8 if bit_depth == 8 else np.uint16
                if tile is not None and tile.shape == (want_rows, width, 3) \
                        and tile.dtype == want_dt:
                    while inflight:  # keep emit() ordering
                        drain_one()
                    skipped += 1
                    emit(tile)
                    continue
            row0 = b * band_rows
            if deep:
                arr = produce_band(row0)  # host numpy, already quantized
            else:
                arr = _quantize(sharded(dyn, jnp.float32(row0)))
                try:
                    arr.copy_to_host_async()
                except Exception:
                    pass  # not every backend exposes async D2H
            inflight.append((b, arr, row0, tile_path))
            if len(inflight) >= 2:
                drain_one()
        while inflight:
            drain_one()
        flush_final(block=True)
        for fut in tile_futures:
            fut.result()  # surface any tile-encode error
    os.replace(out_tmp, out_path)
    if not keep_tiles:
        # the tiles are an interrupted-run resume aid; callers that asked
        # for a single PNG (export-print / session :export) drop them
        # once assembly succeeded
        import shutil

        shutil.rmtree(tile_dir, ignore_errors=True)
    return {"bands": n_bands, "rendered": rendered, "skipped": skipped,
            "fetch_seconds": round(fetch_s, 2),
            "tile_dir": tile_dir, "out": out_path}
