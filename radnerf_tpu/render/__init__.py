"""Rendering orchestration (L4 equivalent of models/rendering.py,
ml_rendering.py, block_rendering.py, mega_rendering.py)."""

from .render import RenderConfig, render_train, render_test  # noqa: F401
from .ml_render import ml_render_train, ml_render_test  # noqa: F401

MAX_SAMPLES = 1024      # reference models/rendering.py:8
NEAR_DISTANCE = 0.01    # reference models/rendering.py:9
