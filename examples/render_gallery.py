"""Render a gallery covering every fractal family and headline feature.

Usage: python examples/render_gallery.py [out_dir] [--width W] [--height H]

Produces one PNG per scene plus gallery.png (a grid montage) — a quick
visual smoke test of the whole framework.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import fractalrenderer_tpu as fr
from fractalrenderer_tpu.utils.image import to_export_orientation
from fractalrenderer_tpu.utils.png import write_png

SCENES = {
    "mandelbrot": fr.Scene(max_iterations=256),
    "seahorse_aa2": fr.presets.find_preset("Seahorse Valley").apply(
        fr.Scene(antialiasing_samples=2)),
    "mandelbrot_trap": fr.Scene(max_iterations=256, orbit_trap_enabled=True,
                                orbit_trap_radius=0.25, zoom=2.5),
    "mandelbrot_stripes": fr.Scene(max_iterations=256, stripe_enabled=True,
                                   stripe_density=8.0, zoom=2.5,
                                   palette_mode=3),
    "julia_rabbit": fr.Scene(fractal_type=fr.FractalType.JULIA, zoom=3.0,
                             max_iterations=256, julia_c_real=-0.123,
                             julia_c_imag=0.745, palette_mode=4),
    "burning_ship": fr.Scene(fractal_type=fr.FractalType.BURNING_SHIP,
                             center_x=-0.5, center_y=-0.6, zoom=2.0,
                             max_iterations=256, palette_mode=8),
    "ship_antenna": fr.presets.find_preset("Ship Antenna").apply(
        fr.Scene(palette_mode=5)),
    "phoenix": fr.Scene(fractal_type=fr.FractalType.PHOENIX, zoom=3.0,
                        max_iterations=256),
    "mandelbulb": fr.Scene(fractal_type=fr.FractalType.MANDELBULB,
                           max_iterations=64),
    "deep_zoom_1e12": fr.Scene(
        fractal_type=fr.FractalType.DEEP_ZOOM,
        hp_center_x="-0.74364388703715158",
        hp_center_y="0.13182590420531198", hp_zoom="1e-12",
        max_iterations=10000, use_perturbation=True,
        use_series_approximation=True),
    # floatexp (ARBITRARY) tier + per-pixel rebasing: depth far past the
    # f32/f64 exponent floor — the dendrite at the Misiurewicz point c=i
    "deep_zoom_1e50": fr.Scene(
        fractal_type=fr.FractalType.DEEP_ZOOM,
        hp_center_x="0", hp_center_y="1", hp_zoom="1e-50",
        max_iterations=2000, use_perturbation=True, palette_mode=1),
    # deep-zoom JULIA set (beyond the reference): the repelling fixed
    # point of c = -0.7+0.27015i at 1e-12
    "deep_julia_1e12": fr.Scene(
        fractal_type=fr.FractalType.DEEP_ZOOM, deep_zoom_julia=True,
        julia_c_real=-0.7, julia_c_imag=0.27015,
        hp_center_x="1.48429274814019050975990244031476915206991101165674905331360770842892636619",
        hp_center_y="-0.13723051425017873265145085419674011778361943544103971650767318150307567798",
        hp_zoom="1e-12", max_iterations=2000, use_perturbation=True,
        palette_mode=2),
    # deep-zoom BURNING SHIP (beyond the reference): armada dust at 1e-10
    "deep_ship_1e10": fr.Scene(
        fractal_type=fr.FractalType.DEEP_ZOOM, deep_zoom_ship=True,
        hp_center_x="-1.7623025", hp_center_y="-0.028000625",
        hp_zoom="1e-10", max_iterations=1500, use_perturbation=True,
        palette_mode=3),
    # floatexp (ARBITRARY) tier for a beyond-reference family: the ship
    # antenna tip at 1e-40 — twenty decades past the old family gates
    "deep_ship_floatexp_1e40": fr.Scene(
        fractal_type=fr.FractalType.DEEP_ZOOM, deep_zoom_ship=True,
        hp_center_x="-2", hp_center_y="0", hp_zoom="1e-40",
        max_iterations=600, use_perturbation=True, palette_mode=2),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="gallery")
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=270)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    tiles = []
    for name, scene in SCENES.items():
        t0 = time.time()
        img = np.asarray(fr.render(scene, args.width, args.height))
        print(f"{name:22s} {time.time()-t0:6.1f}s")
        write_png(os.path.join(args.out_dir, f"{name}.png"),
                  to_export_orientation(img),
                  metadata=scene.metadata_summary())
        tiles.append(np.clip(img[::-1], 0, 1))

    cols = 4
    rows = -(-len(tiles) // cols)
    blank = np.zeros_like(tiles[0])
    tiles += [blank] * (rows * cols - len(tiles))
    grid = np.concatenate(
        [np.concatenate(tiles[r * cols:(r + 1) * cols], axis=1)
         for r in range(rows)], axis=0)
    write_png(os.path.join(args.out_dir, "gallery.png"), grid)
    print(f"gallery -> {args.out_dir}/gallery.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
