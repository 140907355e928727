from nerf3dtalker_tpu.data.mel import melspectrogram, per_frame_mel_chunks  # noqa: F401
