from .reader import MediaReader, write_video, media_available  # noqa: F401
