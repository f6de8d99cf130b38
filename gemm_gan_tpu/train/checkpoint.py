"""Checkpoint/restore of the FULL training state via Orbax.

The reference saves only G/D `state_dict`s at the final epoch
(/root/reference/src/conditional_gan_concat.py:702-703) — no optimizer state,
epoch counter, or RNG, so mid-training resume is impossible (SURVEY.md §5).
Here the entire `GANTrainState`/`VAETrainState` pytree (params, both
optimizer states, step counter, PRNG key) round-trips, making checkpoint
resume the failure-recovery story.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _mgr(path: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_state(path: str, state: Any, step: Optional[int] = None, wait: bool = True):
    import orbax.checkpoint as ocp

    mgr = _mgr(path)
    if step is None:
        step = int(jax.device_get(state.step))
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()
    return step


def restore_state(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `target` (an abstract or concrete state)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(path)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    mgr = _mgr(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def resume_or_fresh(ckpt_dir: str, template_state: Any, steps_per_epoch: int,
                    epochs: int, loader=None):
    """Shared experiment-resume protocol: restore the newest checkpoint into
    `template_state`'s structure and recover epochs-done from its step
    counter; position `loader`'s no-arg epoch stream there. Returns
    `(state, start_epoch)` — `(template_state, 0)` with a WARNING if no
    checkpoint exists (periodic mid-run saves require
    `train.checkpoint_every_eval`; otherwise only a completed run's final
    save is available to continue from)."""
    import logging

    step = latest_step(ckpt_dir)
    if step is None:
        logging.getLogger(__name__).warning(
            "resume requested but no checkpoint under %s — starting fresh "
            "(mid-run checkpoints need train.checkpoint_every_eval)", ckpt_dir)
        return template_state, 0
    state = restore_state(ckpt_dir, jax.device_get(template_state))
    start_epoch = min(int(step) // max(steps_per_epoch, 1), epochs)
    if loader is not None:
        loader.seek(start_epoch)
    return state, start_epoch
