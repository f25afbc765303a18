from .inception_v3 import InceptionV3FID  # noqa: F401
from .i3d import InceptionI3D  # noqa: F401
