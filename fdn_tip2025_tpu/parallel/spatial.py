"""Spatial tiling + sharded high-resolution inference.

Parity: the reference's grids/grids_inverse overlapped crop-and-stitch
(image_restoration_model.py:261-339): adaptive-stride tiles of
(crop_size_h, crop_size_w), restored independently, stitched by
count-matrix averaging. This is the reference's only mechanism for
beyond-memory resolutions (its sequence-parallel analog — SURVEY.md §5).

TPU-first additions:
  * tiles are BATCHED through one jitted forward (static tile shape) —
    the reference loops minibatches of crops;
  * the batch of tiles can be sharded over the device mesh ("data" axis)
    for multi-chip 4K throughput mode.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from fdn_tip2025_tpu.parallel.mesh import batch_sharding


def tile_plan(h, w, crop_h, crop_w):
    """Reference-identical tile origins (adaptive stride, last-tile snap)."""
    num_row = (h - 1) // crop_h + 1
    num_col = (w - 1) // crop_w + 1
    step_i = crop_h if num_row == 1 else \
        math.ceil((h - crop_h) / (num_row - 1) - 1e-8)
    step_j = crop_w if num_col == 1 else \
        math.ceil((w - crop_w) / (num_col - 1) - 1e-8)
    idxes = []
    i = 0
    last_i = False
    while i < h and not last_i:
        if i + crop_h >= h:
            i = h - crop_h
            last_i = True
        j = 0
        last_j = False
        while j < w and not last_j:
            if j + crop_w >= w:
                j = w - crop_w
                last_j = True
            idxes.append((i, j))
            j += step_j
        i += step_i
    return idxes


def tiled_restore(forward_fn, img, crop_h, crop_w, batch_size=None,
                  mesh=None):
    """Restore one image (H, W, C) by overlapped tiling.

    forward_fn: (tiles (N, crop_h, crop_w, C)) -> restored tiles.
    batch_size: tiles per forward (padded with repeats to keep the
    compiled shape static). With a mesh, each tile batch is sharded over
    the "data" axis.
    """
    h, w, c = img.shape
    idxes = tile_plan(h, w, crop_h, crop_w)
    tiles = np.stack([img[i:i + crop_h, j:j + crop_w] for i, j in idxes])
    n = len(idxes)
    bs = batch_size or n
    if mesh is not None:
        # batch must shard evenly over the mesh
        n_dev = int(mesh.devices.size)
        bs = max(n_dev, bs - bs % n_dev)
    else:
        bs = min(bs, n)

    outs = []
    for start in range(0, n, bs):
        chunk = tiles[start:start + bs]
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        x = jnp.asarray(chunk)
        if mesh is not None:
            x = jax.device_put(x, batch_sharding(mesh))
        out = np.asarray(forward_fn(x))
        outs.append(out[: len(chunk) - pad if pad else bs])
    outs = np.concatenate(outs, axis=0)

    acc = np.zeros((h, w, c), np.float32)
    cnt = np.zeros((h, w, 1), np.float32)
    for (i, j), o in zip(idxes, outs):
        acc[i:i + crop_h, j:j + crop_w] += o
        cnt[i:i + crop_h, j:j + crop_w] += 1.0
    return acc / cnt
