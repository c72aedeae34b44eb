from .camera import Camera, make_camera
from .state import GaussianState

__all__ = ["Camera", "make_camera", "GaussianState"]
