from .norms import VideoGroupNorm, SpatialGroupNorm, AdaptiveOrLayerNorm  # noqa: F401
from .attention import dot_product_attention  # noqa: F401
