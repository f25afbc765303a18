from .classifier import (AudioConvNet, VideoR2Plus1DNet, SyncHead,  # noqa: F401
                         AVSyncClassifier)
