from . import pose_utils, spiral  # noqa: F401
