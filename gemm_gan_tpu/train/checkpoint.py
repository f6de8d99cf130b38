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


def resolve_ckpt_dir(ckpt_dir: str, which: str = "last"):
    """Map (a run's checkpoint dir, which in {'last','best'}) -> (dir, step).

    `which="best"` swaps the directory for the sibling `ckpt_best/` (the
    gate-best validation checkpoint `Experiment._maybe_save_best` tracks)
    and pins the restore step to the one `best.json` records. Pinning
    matters: a fresh fit into a previously-used out_dir can leave a stale
    higher-step checkpoint in `ckpt_best/`, and `latest_step` would
    silently prefer it over the new run's best (ADVICE r4). The reference
    has no checkpoint selection at all — it restores whatever final
    state_dict exists (/root/reference/src/conditional_gan_concat.py:869-877).
    """
    if which not in ("last", "best"):
        raise ValueError(f"which must be 'last' or 'best', got {which!r}")
    if which == "last":
        return ckpt_dir, None
    run_dir = os.path.dirname(os.path.normpath(ckpt_dir))
    best_dir = os.path.join(run_dir, "ckpt_best")
    if not os.path.isdir(best_dir):
        raise FileNotFoundError(
            f"no best checkpoint under {best_dir}: gate-best tracking needs "
            "periodic validation during fit (train.freq_compute_test < "
            "train.epochs); use which='last'")
    step = None
    best_json = os.path.join(run_dir, "best.json")
    if os.path.exists(best_json):
        import json

        with open(best_json) as f:
            step = json.load(f).get("step")
    return best_dir, step


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
