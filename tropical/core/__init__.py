from tropical.core.hashgrid import HashGridSpec, TropicalHashGrid, compute_marks
from tropical.core.net import NetSpec, TropicalNet, init_net_params

__all__ = [
    "HashGridSpec", "TropicalHashGrid", "compute_marks",
    "NetSpec", "TropicalNet", "init_net_params",
]
