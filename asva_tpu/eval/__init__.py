from .frechet import frechet_distance  # noqa: F401
from .metrics import (compute_avsync_scores, compute_relsync,  # noqa: F401
                      compute_alignsync, relsync_from_scores,
                      alignsync_from_sims)
