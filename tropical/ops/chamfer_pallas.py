"""Back-compat alias: this module was renamed to
:mod:`tropical.ops.chamfer_tpu` — the default TPU path is the XLA MXU scan
(`min_dist_xla`); the Pallas kernel is the opt-in variant
(TROPICAL_CHAMFER=pallas), so naming the module after it was misleading."""

from tropical.ops.chamfer_tpu import *  # noqa: F401,F403
from tropical.ops.chamfer_tpu import (min_dist_pallas, min_dist_xla,  # noqa: F401
                                      min_nn_distance)
