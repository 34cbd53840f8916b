"""Device mesh + sharding layer.

TPU-native replacement for the reference's distribution stack
(nn/strategy.py NCCL/gloo Lightning strategies, SURVEY.md §2.9): a
``jax.sharding.Mesh`` over (data, spatial) axes with NamedSharding; XLA
inserts all collectives over ICI. No process groups, no backend selection.
"""

from enhax.parallel.mesh import (
    make_mesh, data_sharding, replicated, shard_datapoint, local_mesh_devices,
)
from enhax.parallel.spatial import (
    spatial_sharding, pad_for_spatial, halo_exchange_conv_safe,
)
