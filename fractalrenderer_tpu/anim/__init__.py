"""Animation subsystem: keyframes, .franim IO, batched rendering, video."""
from .keyframes import Animation, InterpolationType, Keyframe, Playback
from .renderer import AnimationRenderer, RenderProgress, RenderStatus
from . import franim, video
