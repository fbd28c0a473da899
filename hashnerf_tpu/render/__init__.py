from hashnerf_tpu.render.renderer import RenderConfig, render_rays, render, render_path
