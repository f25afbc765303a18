from .animation import AnimationPipeline  # noqa: F401
