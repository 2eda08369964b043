from .trainer import NeRFSystem  # noqa: F401
