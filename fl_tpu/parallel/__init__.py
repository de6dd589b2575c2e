"""Device-mesh scale-out of the client axis.

The federated scaling axis is *clients* (SURVEY.md §2.4): the reference
scales by spawning processes/threads per client over gRPC; here the client
axis is a sharded mesh dimension. This package holds the explicit
shard_map/collective formulations; the default engine path uses
jit + NamedSharding (fl_tpu.core.mesh) and lets XLA insert the collectives.
"""

from fl_tpu.parallel.collectives import (  # noqa: F401
    fedavg_psum_shard_map,
    make_sharded_fedavg,
)
