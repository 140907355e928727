from nerf3dtalker_tpu.models.vq.quantizer import VectorQuantizer  # noqa: F401
from nerf3dtalker_tpu.models.vq.stage1 import VQAutoEncoder  # noqa: F401
from nerf3dtalker_tpu.models.vq.au_classifier import AUClassifier  # noqa: F401
