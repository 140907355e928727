from nerf3dtalker_tpu.models.face3d.rasterizer import rasterize_mesh, render_mesh  # noqa: F401
