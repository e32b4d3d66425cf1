from . import gaussians  # noqa: F401
from .gaussians import GaussianModel, GaussianParams, create_from_pcd  # noqa: F401
