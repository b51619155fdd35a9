"""Device mesh + sharding helpers (the NCCL/DDP replacement).

The reference's distribution stack (torch.distributed + NCCL DDP,
basicsr/utils/dist_util.py, base_model.py:60-78) maps to single-process
SPMD here: a jax.sharding.Mesh over ICI, batch-sharded arrays via
NamedSharding, and XLA-inserted collectives (psum for grad/loss/metric
reductions — replacing DDP backward allreduce and dist.reduce at
base_model.py:344 / image_restoration_model.py:878).

Mesh axes: ("data",) for pure DP — the model is <=8M params so TP/PP are
not needed (SURVEY.md §2.8); "spatial" sharding for tiled 4K inference
lives in parallel/spatial.py.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data"):
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh, axis="data"):
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def spatial_sharding(mesh, axis="data"):
    """Shard the H dimension of an NHWC image over the mesh — the
    sequence-parallel analog for an image model (SURVEY.md §2.8): one
    image's rows split across chips, GSPMD inserts halo exchanges for
    the convs and collectives for the full-image DFT matmuls / global
    reductions. Lowers per-image latency instead of batch throughput."""
    return NamedSharding(mesh, P(None, axis, None, None))


def shard_batch(batch, mesh, axis="data", keys=("lq", "gt")):
    """device_put the array entries of a batch dict, batch-sharded."""
    sh = batch_sharding(mesh, axis)
    out = dict(batch)
    for k in keys:
        if k in batch:
            out[k] = jax.device_put(batch[k], sh)
    return out


def replicate_tree(tree, mesh):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def multihost_initialize(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host (DCN) bootstrap — jax.distributed.initialize wrapper,
    the analog of dist_util.init_dist's slurm path (:27-57). No-op when
    env provides the standard TPU runtime variables."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
