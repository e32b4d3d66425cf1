from . import colmap, dataset, ply, readers  # noqa: F401
