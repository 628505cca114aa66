"""Multi-chip mesh sharding and progressive tiled rendering."""
from .mesh import frame_row_sharding, make_render_mesh, row_sharding
from .tiled import render_frames_sharded, render_giant_still, render_sharded
