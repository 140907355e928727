from nerf3dtalker_tpu.models.nerf_mlp import NeRFMLP  # noqa: F401
from nerf3dtalker_tpu.models.neural_renderer import NeuralRenderer  # noqa: F401
from nerf3dtalker_tpu.models.headnerf import HeadNeRF  # noqa: F401
