"""Orbax checkpoint save/resume.

Rebuild of reference ``utils.py:280-321`` (save_checkpoint /
auto_resume_helper) on orbax: checkpoints hold
{params, opt_state, batch_stats, step, epoch, max_accuracy, rng} and are
written under ``<output>/ckpt_epoch_<N>`` with an mtime-latest
auto-resume scan. Torch ``.pth`` resume goes through
``mtlora_tpu.ckpt.torch_convert`` instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(output_dir: str, epoch: int, state,
                    max_accuracy: float = 0.0,
                    config_dump: Optional[str] = None,
                    keep: int = 0) -> str:
    """Write a checkpoint (reference save_checkpoint utils.py:280-294)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(output_dir, f"ckpt_epoch_{epoch}"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": state.step,
        "rng": state.rng,
        "meta": np.asarray([epoch, max_accuracy], np.float64),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    import jax

    if config_dump and jax.process_index() == 0:
        with open(os.path.join(output_dir, "config.yaml"), "w") as f:
            f.write(config_dump)
    if keep > 0:
        ckpts = sorted(_list_ckpts(output_dir),
                       key=lambda p: int(p.rsplit("_", 1)[1]))
        for old in ckpts[:-keep]:
            import shutil

            shutil.rmtree(os.path.join(output_dir, old),
                          ignore_errors=True)
    return path


def _list_ckpts(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    return [d for d in os.listdir(output_dir)
            if d.startswith("ckpt_epoch_")
            and os.path.isdir(os.path.join(output_dir, d))]


def auto_resume_helper(output_dir: str) -> Optional[str]:
    """mtime-latest checkpoint dir (reference utils.py:310-321)."""
    ckpts = _list_ckpts(output_dir)
    if not ckpts:
        return None
    full = [os.path.join(output_dir, d) for d in ckpts]
    return max(full, key=os.path.getmtime)


def load_checkpoint(path: str, state, mesh=None) -> Dict[str, Any]:
    """Restore a checkpoint into a TrainState-shaped target.

    ``mesh``: required under multi-process SPMD — the target leaves are
    then ABSTRACT arrays with a replicated global sharding, so every
    process materializes its replica straight from the (shared)
    checkpoint files. Concrete per-process local arrays as targets make
    orbax restore on one host and attempt cross-host device transfers,
    which the CPU/TPU backends here reject (the reference's
    torch.load-per-rank has the same every-process-reads semantics,
    utils.py:295-309).

    Returns {"state": new_state, "epoch": int, "max_accuracy": float}.
    """
    import jax

    ocp = _ocp()
    target = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": state.step,
        "rng": state.rng,
        "meta": np.zeros((2,), np.float64),
    }
    if mesh is not None and jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())

        def _abstract(x):
            x = jax.numpy.asarray(x)
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=rep)

        for k in ("params", "opt_state", "batch_stats", "step", "rng"):
            target[k] = jax.tree.map(_abstract, target[k])
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    new_state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"], step=restored["step"],
        rng=restored["rng"])
    epoch, max_acc = np.asarray(restored["meta"])
    return {"state": new_state, "epoch": int(epoch),
            "max_accuracy": float(max_acc)}
