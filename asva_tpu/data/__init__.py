from .transforms import (sd_video_transform, clip_frame_transform,  # noqa: F401
                         fid_frame_transform, fvd_frame_transform)
