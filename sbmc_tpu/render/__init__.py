from sbmc_tpu.render.pathtracer import (  # noqa: F401
    TracerScene,
    random_tracer_scene,
    render_pass,
    render_tile_wavefront,
    render_tiles_wavefront,
)
