"""Escape-time field kernels, palettes, coloring, mapping, dd math."""
