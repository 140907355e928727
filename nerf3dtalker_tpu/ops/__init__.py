from nerf3dtalker_tpu.ops.embedding import positional_encoding  # noqa: F401
from nerf3dtalker_tpu.ops.rays import (  # noqa: F401
    gen_rays,
    stratified_zvals,
    sample_points,
    fine_zvals,
)
from nerf3dtalker_tpu.ops.compositing import alpha_composite  # noqa: F401
