from . import camera, sh, transforms  # noqa: F401
from .camera import Camera, make_camera, shift_camera  # noqa: F401
