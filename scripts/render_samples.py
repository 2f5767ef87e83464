#!/usr/bin/env python
"""Render per-sample .bin tiles for a .pbrt scene using the instrumented
PBRT renderer (reference: scripts/render_samples.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sbmc_tpu.rendering import PBRTSamplesRenderer, SamplesRenderingParser  # noqa: E402

if __name__ == "__main__":
    parser = SamplesRenderingParser()
    args = parser.parse_args()
    renderer = PBRTSamplesRenderer(args)
    renderer.render()
