"""Deep-zoom subsystem: HP math, reference orbits, session manager."""
from .hp import (HPComplex, HPFloat, PrecisionMode,
                 calculate_precision_bits_for_zoom, precision_mode_for_zoom)
from .manager import DeepZoomManager, DeepZoomState, ZoomKeyframe
from .orbit import compute_orbit, compute_orbit_python
