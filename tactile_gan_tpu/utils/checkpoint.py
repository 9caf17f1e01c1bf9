"""Checkpoint IO.

Structure-compatible with the reference's torch.save dict
(/root/reference/train.py:203-209): the same four top-level keys
{'gen', 'disc', 'optimizerG_state_dict', 'optimizerD_state_dict'} (plus
'step'), with each value a plain nested dict of numpy arrays (flax
state-dict form), serialized with msgpack. The file keeps the reference's
``final_model.pth`` name so directory layouts are interchangeable.

Writes are atomic (tmp file + rename) — the reference has no crash safety.
``restore_partial`` is the strict=False analogue (/root/reference/test.py:41):
restore by key intersection, keep the template's value for anything missing.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_plain(tree: Any) -> Any:
    return serialization.to_state_dict(
        jax.tree.map(lambda x: np.asarray(x), tree))


def save_checkpoint(path: str, *, gen, disc, opt_g, opt_d, step: int) -> None:
    payload = {
        "gen": _to_plain(gen),
        "disc": _to_plain(disc),
        "optimizerG_state_dict": _to_plain(opt_g),
        "optimizerD_state_dict": _to_plain(opt_d),
        "step": int(step),
    }
    blob = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class AsyncCheckpointer:
    """Background-thread checkpoint writer (orbax-style async save): the
    device_get happens on the caller, serialization + disk IO overlap with
    the next epoch's compute. One in-flight save at a time; ``wait()`` before
    process exit or before reading the file back."""

    def __init__(self):
        import concurrent.futures as cf
        self._pool = cf.ThreadPoolExecutor(max_workers=1)
        self._pending = None

    def save(self, path: str, **kwargs) -> None:
        self.wait()
        self._pending = self._pool.submit(save_checkpoint, path, **kwargs)

    def wait(self) -> None:
        if self._pending is not None:
            self._pending.result()
            self._pending = None


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint — ours (msgpack) or a PyTorch reference
    final_model.pth (auto-detected and converted, weights only), so trained
    reference models drop straight into test.py / --continue_training."""
    from tactile_gan_tpu.utils import torch_migrate

    if torch_migrate.is_torch_checkpoint(path):
        return torch_migrate.load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_partial(template: Any, state_dict: Any) -> Any:
    """Recursively merge ``state_dict`` into the structure of ``template``,
    keeping template leaves where the checkpoint has no matching key — the
    functional analogue of load_state_dict(strict=False). Works on any
    pytree (optax tuples serialize to indexed dicts in state-dict form)."""
    plain_template = serialization.to_state_dict(template)
    merged = _merge(plain_template, state_dict)
    return serialization.from_state_dict(template, merged)


def _merge(template: Any, incoming: Any) -> Any:
    if not isinstance(template, dict):
        return incoming if incoming is not None else template
    out = {}
    for k, v in template.items():
        if isinstance(incoming, dict) and k in incoming:
            out[k] = _merge(v, incoming[k])
        else:
            out[k] = v
    return out
