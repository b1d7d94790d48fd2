"""Checkpointing: orbax training checkpoints (resume) + a portable deployment
bundle (.snf.npz, the reference's save_state.snf successor).

The reference pickles the entire live rendering nn.Module (sunerf.py:62-74)
— unreproducible across code versions. Here the two artifacts are:
  * train checkpoint: orbax tree {params, opt_state, step} under
    <workdir>/checkpoints/step_N (+ 'last' convention via highest step);
  * deployment bundle: flat npz of parameters + a JSON sidecar carrying the
    renderer/data config — no pickled code, loadable anywhere.
"""
from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
import orbax.checkpoint as ocp

from sunerf_tpu.train.step import TrainState


# ----------------------------------------------------------- train ckpt

def _ckpt_dir(workdir: str) -> str:
    return os.path.join(os.path.abspath(workdir), 'checkpoints')


def save_train_checkpoint(workdir: str, state: TrainState) -> str:
    path = os.path.join(_ckpt_dir(workdir), f'step_{int(state.step):08d}')
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(workdir: str) -> str | None:
    d = _ckpt_dir(workdir)
    if not os.path.isdir(d):
        return None
    steps = [(int(m.group(1)), f) for f in os.listdir(d)
             if (m := re.fullmatch(r'step_(\d+)', f))]
    if not steps:
        return None
    return os.path.join(d, max(steps)[1])


def restore_train_checkpoint(workdir: str, target: TrainState) -> TrainState | None:
    """Restore the newest checkpoint into the structure of `target`
    (resume-from-last, reference run_emission.py:38,75).

    Tolerates spike-guard state mismatches in either direction: a checkpoint
    without loss_ema/snapshot leaves restores into a guard-on target (guard
    state re-initialized from the target), and a guard-on checkpoint restores
    into a guard-off target (guard state dropped). The Polyak ema_params leaf
    is tolerated the same way in both directions."""
    path = latest_checkpoint(workdir)
    if path is None:
        return None
    ckptr = ocp.StandardCheckpointer()
    t_np = jax.tree.map(np.asarray, target)
    candidates = [t_np]
    if target.trip_count is not None:
        # guard-on checkpoint from before the trip counter existed
        candidates.append(t_np._replace(trip_count=None))
    if target.snapshot is not None or target.loss_ema is not None:
        # legacy / guard-off checkpoint shapes
        candidates.append(t_np._replace(loss_ema=None, snapshot=None,
                                        trip_count=None))
    if target.snapshot is None:
        # guard-on checkpoint restored into a guard-off run
        ema = t_np.loss_ema if t_np.loss_ema is not None \
            else np.asarray(-1.0, np.float32)
        guard_on = t_np._replace(
            loss_ema=ema, snapshot=(t_np.params, t_np.opt_state),
            trip_count=np.asarray(0, np.int32))
        candidates.append(guard_on)
        candidates.append(guard_on._replace(trip_count=None))
    # ema_params toggling is orthogonal to the guard leaves: for every
    # guard-shaped candidate also try the OPPOSITE ema shape (pre-ema or
    # ema-off checkpoints into ema-on targets, and vice versa — ema_params
    # mirrors the params structure exactly)
    candidates += [
        cand._replace(ema_params=(None if cand.ema_params is not None
                                  else jax.tree.map(np.copy, cand.params)))
        for cand in candidates]
    restored, errors = None, []
    for cand in candidates:
        try:
            restored = ckptr.restore(path, target=cand)
            break
        except Exception as e:  # noqa: BLE001 — orbax raises various types
            errors.append(e)
    if restored is None:
        # surface the underlying failures: a genuinely corrupt checkpoint or
        # an IO error must not be misreported as a structure mismatch
        raise ValueError(
            f'checkpoint {path} could not be restored with any of the '
            f'{len(candidates)} candidate state structures (with/without '
            f'spike-guard leaves); last error: {errors[-1]!r}') from errors[-1]
    # re-shape onto the requested target: keep restored core state, fill the
    # target's guard defaults where the checkpoint had none (and vice versa)
    restored = target._make(
        r if r is not None or t is None else t
        for t, r in zip(t_np, restored))
    if target.snapshot is None:
        restored = restored._replace(snapshot=None, loss_ema=t_np.loss_ema,
                                     trip_count=None)
    elif len(restored.snapshot) == 2 and restored.snapshot is t_np.snapshot:
        # guard-off (legacy) checkpoint restored into a guard-on run: the
        # snapshot above came from the target's FRESH-INIT params — a trip on
        # the first post-resume step would roll back to untrained weights.
        # Rebuild it from the restored params/opt_state (copied: the jitted
        # step donates the state, and aliasing two leaves is an XLA error).
        restored = restored._replace(
            loss_ema=np.asarray(-1.0, np.float32),
            snapshot=(jax.tree.map(np.copy, restored.params),
                      jax.tree.map(np.copy, restored.opt_state)))
    if target.ema_params is None:
        restored = restored._replace(ema_params=None)
    elif restored.ema_params is t_np.ema_params:
        # ema-off (or legacy) checkpoint restored into an ema-on run: the
        # fill above came from the target's FRESH-INIT params; restart the
        # average from the restored params instead (copied — the jitted step
        # donates the state, and aliasing two leaves is an XLA error)
        restored = restored._replace(
            ema_params=jax.tree.map(np.copy, restored.params))
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r, t.dtype) if hasattr(t, 'dtype') else r,
                        target, restored)


# ----------------------------------------------------------- deployment

def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}/'))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_state(path: str, params: dict, config: dict):
    """Write the deployment bundle: <path>.npz (flat params) + <path>.json
    (render/data config). Equivalent role to the reference's save_state.snf
    (consumed by SuNeRFLoader, evaluation/loader.py:23)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    base = path[:-4] if path.endswith('.npz') else path
    np.savez(base + '.npz', **_flatten(params))
    with open(base + '.json', 'w') as f:
        json.dump(config, f, indent=2, default=str)


def load_state(path: str) -> tuple[dict, dict]:
    """Read a deployment bundle -> (params pytree, config dict)."""
    base = path[:-4] if path.endswith('.npz') else path
    with np.load(base + '.npz') as f:
        params = _unflatten({k: f[k] for k in f.files})
    with open(base + '.json') as f:
        config = json.load(f)
    return params, config
