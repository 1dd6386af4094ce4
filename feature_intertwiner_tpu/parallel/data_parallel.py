"""SPMD data parallelism over a TPU device mesh.

Replaces the reference's single-process ``nn.DataParallel``
(``/root/reference/tools/utils.py:645-654``; scatter/replicate/gather every
step over NVLink) with ``shard_map`` over a 1-D ``data`` mesh axis:

- the batch is sharded on its leading axis; parameters/optimizer state are
  replicated (kept replicated by identical ``pmean``'d updates — no per-step
  weight broadcast, unlike DataParallel);
- gradient reduction is an in-graph ``lax.pmean`` over ICI;
- the intertwiner's cross-device statistic merge — a host-side gather of
  ``[gpu, scale, 1024, 81]`` tensors in the reference (lib/model.py:217-224,
  workflow.py:180) — is a ``lax.psum`` inside the loss (train/step.py);
- per-device RNG streams are split by ``axis_index`` (the reference gets
  distinct sampling randomness per GPU from the global RNG as a side effect).

Multi-slice DP over DCN is the same code with a larger mesh — XLA routes the
collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.step import make_train_step


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(mesh_utils.create_device_mesh((n,), devices=devices[:n]),
                ("data",))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh):
    """Shard a batch dict along its leading axis over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def make_parallel_train_step(model, cfg, layers: str, mesh: Mesh):
    """Jitted SPMD train step. batch leading dim must divide by mesh size."""
    inner = make_train_step(model, cfg, layers, axis_name="data")

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data"), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded_step(state, batch, lr, meta_gate, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        new_state, metrics = inner(state, batch, lr, meta_gate, rng)
        return new_state, metrics

    return jax.jit(sharded_step, donate_argnums=(0,))


def make_parallel_eval_step(model, mesh: Mesh, mode: str = "inference",
                            with_masks: bool = True):
    """Jitted SPMD inference step: batch sharded, outputs sharded.

    Returns (outputs, roi_unfit_overflow): the window-RoIAlign degradation
    counter is psum'd over the data axis (replicated scalar) so callers see
    the whole batch's count, matching the single-device closure."""
    from ..train.step import sum_diagnostics

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    def sharded_eval(variables, images, windows):
        kw = {"with_masks": with_masks} if mode == "inference" else {}
        out, mutated = model.apply(variables, images, mode=mode,
                                   windows=windows, mutable=["diagnostics"],
                                   **kw)
        overflow = sum_diagnostics(mutated, "roi_unfit_overflow")
        return out, jax.lax.psum(overflow, "data")

    return jax.jit(sharded_eval)
