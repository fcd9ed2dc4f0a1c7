"""Checkpointing with the reference's best/last/resume semantics.

The reference uses ``torch.save`` state_dicts: captioner ``best.pth`` on
CIDEr improvement + ``last.pth`` per epoch (``train_prompt.py:167-177``);
retrieval saves {model, optimizer, config, epoch} and resumes all three
(``retrieval/pretrain.py:144-150,193-230``). Here:

- model-only snapshots -> single msgpack files via flax.serialization
  (the ``best.pth`` analog, fast and file-shaped),
- full train-state (params + optimizer + step) -> Orbax checkpoint dirs
  for resume.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization

__all__ = [
    "save_params",
    "load_params",
    "save_train_state",
    "restore_train_state",
    "criterion_improver",
]


def save_params(path: str, params: Any) -> None:
    """Single-file msgpack snapshot (the best.pth/last.pth analog)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


_ASYNC_SAVES: dict = {}


def save_params_async(path: str, params: Any) -> None:
    """``save_params`` in a background thread. On a remote-attached TPU the
    ``device_get`` streams at ~8 MB/s, so a GPT-2-base snapshot blocks the
    train loop for ~a minute per save (measured round 5); jax arrays are
    immutable, so a thread snapshots safely while training continues.
    Writes to the SAME path are serialized (join the previous one first);
    call ``join_async_saves()`` before reading the files or exiting."""
    import threading

    prev = _ASYNC_SAVES.get(path)
    if prev is not None:
        prev.join()
    t = threading.Thread(target=save_params, args=(path, params))
    t.start()
    _ASYNC_SAVES[path] = t


def join_async_saves() -> None:
    for path in list(_ASYNC_SAVES):
        _ASYNC_SAVES.pop(path).join()


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _state_payload(state: Any) -> Any:
    if hasattr(state, "params"):
        payload = {"params": state.params, "step": state.step}
        for opt_field in ("batch_stats", "opt_state"):
            if hasattr(state, opt_field):
                payload[opt_field] = getattr(state, opt_field)
        return payload
    return state


def save_train_state(path: str, state: Any) -> None:
    """Orbax full-state checkpoint (resume semantics). Train-state objects
    are stored as a named dict so partial (model-only) restores work."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(_state_payload(state)), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, template: Any) -> Any:
    """Full resume: params + optimizer + step."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path), target=_state_payload(template))
    if hasattr(template, "params"):
        import dataclasses

        return dataclasses.replace(template, **payload)
    return payload


def restore_model_only(path: str, template: Any) -> Any:
    """Warm start: restore only params (+ batch_stats), keep the fresh
    optimizer — the reference's ``pretrain_path`` load semantics
    (``retrieval/train.py:151-155``)."""
    import dataclasses

    import orbax.checkpoint as ocp

    want = {"params": template.params}
    if hasattr(template, "batch_stats"):
        want["batch_stats"] = template.batch_stats
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(item=want, partial_restore=True),
    )
    return dataclasses.replace(template, **restored)


def criterion_improver(mode: str):
    """Closure tracking best value (``utils.py:33-47``)."""
    assert mode in ("loss", "acc", "score")
    # score/acc start at -inf (not the reference's 0) so a first validation
    # of 0.0 still checkpoints; strictly more robust, same trajectory after.
    best = float("inf") if mode == "loss" else float("-inf")

    def inner(x: float) -> bool:
        nonlocal best
        better = x < best if mode == "loss" else x > best
        if better:
            best = x
        return better

    return inner
