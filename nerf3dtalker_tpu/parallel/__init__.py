from nerf3dtalker_tpu.parallel.mesh import make_mesh, batch_sharding, replicated  # noqa: F401
from nerf3dtalker_tpu.parallel.partial_fc import (  # noqa: F401
    sharded_sampled_softmax_ce,
    sharded_softmax_ce,
)
