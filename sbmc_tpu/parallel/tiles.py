"""Overlap-tiled full-frame inference (reference: scripts/denoise.py:42-93).

Large frames are processed in overlapping tiles to bound device memory; the
overlap (``pad``) absorbs the model's receptive-field border so tiles stitch
seamlessly. ``split_tiles``/``pad_back``/``merge_tiles`` reproduce the
reference semantics (with the reference's tile-duplication and dropped
global-features quirks fixed); tiles are independent, so they can be
round-robined across devices or hosts for multi-chip denoising.
"""

import numpy as np

__all__ = ["split_tiles", "pad_back", "merge_tiles"]

_TILE_KEYS = ["radiance", "features", "kpcn_diffuse_in", "kpcn_specular_in",
              "kpcn_diffuse_buffer", "kpcn_specular_buffer", "kpcn_albedo"]
_UNCHANGED_KEYS = ["global_features", "sample_mask", "spp"]


def split_tiles(batch, max_sz=1024, pad=256):
    """Split a full-frame batch into overlapping tiles.

    Args:
      batch: dict with image-like arrays (spatial dims last).
      max_sz: maximum tile extent (including overlap).
      pad: overlap with neighboring tiles on interior edges.

    Returns:
      list of ``(tile_batch, y0, y1, x0, x1, (py0, py1, px0, px1))`` where
      ``[y0:y1, x0:x1]`` is the output region this tile is responsible for
      and the ``p*`` entries are the overlap margins to strip from the
      tile's (re-padded) output.
    """
    ref_key = "features" if "features" in batch else "kpcn_diffuse_in"
    h, w = batch[ref_key].shape[-2:]
    if h <= max_sz and w <= max_sz:
        return [(batch, 0, h, 0, w, (0, 0, 0, 0))]
    step = max_sz - 2 * pad
    if step <= 0:
        raise ValueError("max_sz must exceed 2 * pad")
    tiles = []
    for start_y in range(0, h, step):
        pad_y, pad_y2 = (0 if start_y == 0 else pad), pad
        end_y = start_y + max_sz
        if end_y >= h:
            end_y, pad_y2 = h, 0
        for start_x in range(0, w, step):
            pad_x, pad_x2 = (0 if start_x == 0 else pad), pad
            end_x = start_x + max_sz
            if end_x >= w:
                end_x, pad_x2 = w, 0
            tb = {}
            for k in _UNCHANGED_KEYS:
                if k in batch:
                    tb[k] = batch[k]
            for k in _TILE_KEYS:
                if k in batch:
                    tb[k] = batch[k][..., start_y:end_y, start_x:end_x]
            tiles.append((tb, start_y + pad_y, end_y - pad_y2,
                          start_x + pad_x, end_x - pad_x2,
                          (pad_y, pad_y2, pad_x, pad_x2)))
            if end_x == w:
                break
        if end_y == h:
            break
    return tiles


def pad_back(tile_batch, out):
    """Zero-pad a model output back to its input tile size (the model crops
    a receptive-field border, reference: scripts/denoise.py:42-51)."""
    ref_key = "features" if "features" in tile_batch else "kpcn_diffuse_in"
    ref = tile_batch[ref_key]
    pad_h = (ref.shape[-2] - out.shape[-2]) // 2
    pad_w = (ref.shape[-1] - out.shape[-1]) // 2
    p = max(pad_h, pad_w)
    widths = [(0, 0)] * (out.ndim - 2) + [(p, p), (p, p)]
    return np.pad(np.asarray(out), widths)


def merge_tiles(canvas, tile_outputs):
    """Paste stripped tile outputs into the full-frame canvas.

    Args:
      canvas: ``[..., h, w]`` numpy array to fill.
      tile_outputs: iterable of ``(out, y0, y1, x0, x1, tilepad)`` where
        ``out`` is the tile's re-padded output (input-tile-sized).
    """
    for out, y0, y1, x0, x1, (py0, py1, px0, px1) in tile_outputs:
        out = np.asarray(out)
        out = out[..., py0:out.shape[-2] - py1, px0:out.shape[-1] - px1]
        canvas[..., y0:y1, x0:x1] = out
    return canvas
