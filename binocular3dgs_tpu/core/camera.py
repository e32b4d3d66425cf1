"""Camera model.

Behavioral parity target: reference `scene/cameras.py:17-84` (matrix
conventions, znear/zfar defaults, focal getters) and the shifted-camera
construction of reference `scene/__init__.py:96-115` used by the binocular
consistency loss.

The camera is a JAX pytree (flax.struct) so batches of cameras stack with
`jax.tree.map` and camera construction/shifting can run inside jit. Image
width/height are static (pytree-aux) fields — they determine array shapes.
Matrices use the row-vector convention (see core/transforms.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import struct

from .transforms import projection_matrix, world_to_view

DEFAULT_ZNEAR = 0.01
DEFAULT_ZFAR = 100.0


@struct.dataclass
class Camera:
    # Row-vector convention: p_view = [p, 1] @ world_view.
    world_view: jnp.ndarray  # (4, 4)
    proj: jnp.ndarray  # (4, 4) row-convention perspective projection
    full_proj: jnp.ndarray  # (4, 4) = world_view @ proj
    cam_center: jnp.ndarray  # (3,) camera center in world space
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)
    znear: float = struct.field(pytree_node=False, default=DEFAULT_ZNEAR)
    zfar: float = struct.field(pytree_node=False, default=DEFAULT_ZFAR)

    @property
    def focal_x(self):
        """fx in pixels (reference `scene/cameras.py:67-70`)."""
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    trans: np.ndarray | None = None,
    scale: float = 1.0,
    znear: float = DEFAULT_ZNEAR,
    zfar: float = DEFAULT_ZFAR,
) -> Camera:
    """Host-side camera construction from COLMAP-style (R, T).

    `R`: camera-to-world rotation (transposed COLMAP rotation, as the data
    layer produces); `T`: world-to-camera translation.
    """
    w2v = world_to_view(R, T, translate=trans, scale=scale)  # column convention
    proj = projection_matrix(znear, zfar, fovx, fovy)  # column convention
    world_view = w2v.T  # row convention (stored transposed, like the reference)
    proj_row = proj.T
    full_proj = world_view @ proj_row
    cam_center = np.linalg.inv(world_view)[3, :3]
    return Camera(
        world_view=jnp.asarray(world_view, dtype=jnp.float32),
        proj=jnp.asarray(proj_row, dtype=jnp.float32),
        full_proj=jnp.asarray(full_proj, dtype=jnp.float32),
        cam_center=jnp.asarray(cam_center, dtype=jnp.float32),
        tanfovx=jnp.asarray(math.tan(fovx / 2.0), dtype=jnp.float32),
        tanfovy=jnp.asarray(math.tan(fovy / 2.0), dtype=jnp.float32),
        width=int(width),
        height=int(height),
        znear=float(znear),
        zfar=float(zfar),
    )


def shift_camera(camera: Camera, trans_dist) -> Camera:
    """Camera translated by `trans_dist` along its own x axis (traceable).

    Equivalent to reference `scene/__init__.py:96-115` + `getWorld2View2`:
    the camera center moves by R_c2w @ [d, 0, 0] in world space while the
    orientation is unchanged. Implemented directly on the stored matrices so
    it can run inside jit with a traced `trans_dist`.
    """
    trans_dist = jnp.asarray(trans_dist, dtype=jnp.float32)
    M = camera.world_view.T  # actual column-convention W2C
    Rw2c = M[:3, :3]
    x_axis_world = Rw2c.T @ jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32)
    new_center = camera.cam_center + trans_dist * x_axis_world
    new_t = -Rw2c @ new_center
    new_M = M.at[:3, 3].set(new_t)
    world_view = new_M.T
    full_proj = world_view @ camera.proj
    return camera.replace(
        world_view=world_view,
        full_proj=full_proj,
        cam_center=new_center,
    )
