"""Schema-versioned checkpointing (orbax-backed).

The reference has two mutually inconsistent torch checkpoint schemas:
``save_checkpoint_segmen_model`` writes ``{base_pointnet, segmen_net, opt_pointnet,
opt_segmen, task, batch_size, lr, number_of_points, epoch, epochs_since_improvement,
accuracy}`` (``utils/utils.py:422-438``) while ``save_checkpoint`` writes ``{model,
optimizer, ..., weighing_method}`` (``utils/utils.py:441-456``) — and
``baseline/test_segmentation.py:68`` reads a key the matching trainer never writes.
Here there is ONE schema, carrying every logical field of both, plus an explicit
``schema_version`` so future migrations are mechanical (SURVEY.md §5).

Layout on disk::

    <dir>/<name>/state/      orbax PyTree (params, batch_stats, opt_state, counters)
    <dir>/<name>/meta.json   hyperparameters + schema version + full AMPNetConfig
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

SCHEMA_VERSION = 1


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    """Save/restore train state with reference-equivalent metadata.

    ``save`` is synchronous.  ``save_async`` queues the device→host fetch and
    the orbax/meta write onto a single background writer thread so the training
    loop never blocks on checkpoint IO (the reference saves inline every time
    val loss improves, ``train_pointnet-attention.py:314-330`` — on a remote
    TPU transport that fetch is epoch-scale).  Pending writes coalesce per
    name (only the newest queued state for a name is written), and every read
    path (``restore``/``exists``/``load_meta``) plus ``save`` itself drains the
    queue first, so within a process ordering is indistinguishable from the
    synchronous path.
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        self._lock = threading.Lock()
        self._pending: Dict[str, Tuple[Any, Dict[str, Any]]] = {}
        self._writer: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    @staticmethod
    def _payload(state) -> Dict[str, Any]:
        return {
            "params": _tree_to_numpy(state.params),
            "batch_stats": _tree_to_numpy(state.batch_stats),
            "opt_state": _tree_to_numpy(state.opt_state),
            "step": np.asarray(state.step),
            "epoch": np.asarray(state.epoch),
            "lr_scale": np.asarray(
                state.lr_scale if state.lr_scale is not None else 1.0, np.float32
            ),
        }

    def save(
        self,
        name: str,
        state,
        *,
        task: str = "segmentation",
        accuracy: float = 0.0,
        epochs_since_improvement: int = 0,
        config_json: Optional[str] = None,
        weighing_method: Optional[str] = None,
        batch_size: Optional[int] = None,
        learning_rate: Optional[float] = None,
        number_of_points: Optional[int] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> str:
        self.wait()
        return self._write(
            name,
            self._payload(state),
            task=task,
            accuracy=accuracy,
            epochs_since_improvement=epochs_since_improvement,
            config_json=config_json,
            weighing_method=weighing_method,
            batch_size=batch_size,
            learning_rate=learning_rate,
            number_of_points=number_of_points,
            extra_meta=extra_meta,
        )

    def save_async(self, name: str, state, **meta_kwargs) -> None:
        """Queue a checkpoint write; returns immediately.

        ``state`` must stay valid until written: pass host arrays or device
        buffers that will NOT be donated to a later step (the Trainer hands in
        fresh on-device copies — see ``Trainer._save_best``).  The device→host
        fetch happens on the writer thread, off the training critical path.
        """
        with self._lock:
            if self._error is not None:
                err, self._error = self._error, None
                raise RuntimeError("previous async checkpoint write failed") from err
            self._pending[name] = (state, meta_kwargs)
            if self._writer is None:
                self._writer = threading.Thread(
                    target=self._drain, name="ckpt-writer", daemon=True
                )
                self._writer.start()

    def _drain(self) -> None:
        while True:
            with self._lock:
                if not self._pending:
                    self._writer = None
                    return
                name, (state, kwargs) = next(iter(self._pending.items()))
                del self._pending[name]
            try:
                payload = self._payload(jax.device_get(state))
                self._write(name, payload, **kwargs)
            except BaseException as e:  # surfaced by wait()/next save_async
                with self._lock:
                    self._error = e
                    self._pending.clear()
                    self._writer = None
                return

    def wait(self) -> None:
        """Block until every queued async write has landed; re-raise failures."""
        while True:
            with self._lock:
                writer = self._writer
                err, self._error = self._error, None
            if err is not None:
                raise RuntimeError("async checkpoint write failed") from err
            if writer is None:
                return
            writer.join()

    def _write(
        self,
        name: str,
        payload: Dict[str, Any],
        *,
        task: str = "segmentation",
        accuracy: float = 0.0,
        epochs_since_improvement: int = 0,
        config_json: Optional[str] = None,
        weighing_method: Optional[str] = None,
        batch_size: Optional[int] = None,
        learning_rate: Optional[float] = None,
        number_of_points: Optional[int] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> str:
        target = self.path(name)
        self._ckptr.save(os.path.join(target, "state"), payload, force=True)
        meta = {
            "schema_version": SCHEMA_VERSION,
            "task": task,
            "accuracy": float(accuracy),
            "epochs_since_improvement": int(epochs_since_improvement),
            "batch_size": batch_size,
            "lr": learning_rate,
            "number_of_points": number_of_points,
            "weighing_method": weighing_method,
            "config": json.loads(config_json) if config_json else None,
        }
        if extra_meta:
            meta.update(extra_meta)
        with open(os.path.join(target, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
        return target

    def load_meta(self, name: str) -> Dict[str, Any]:
        self.wait()
        with open(os.path.join(self.path(name), "meta.json")) as f:
            meta = json.load(f)
        v = meta.get("schema_version")
        if v != SCHEMA_VERSION:
            raise ValueError(f"checkpoint schema {v} != supported {SCHEMA_VERSION}")
        return meta

    def restore(self, name: str, state) -> Tuple[Any, Dict[str, Any]]:
        """Restore into an existing (template) train state; returns (state, meta).

        Like the reference resume path (train_pointnet-attention.py:151-162) this
        restores params, optimizer state and counters.
        """
        meta = self.load_meta(name)
        template = {
            "params": _tree_to_numpy(state.params),
            "batch_stats": _tree_to_numpy(state.batch_stats),
            "opt_state": _tree_to_numpy(state.opt_state),
            "step": np.asarray(state.step),
            "epoch": np.asarray(state.epoch),
            "lr_scale": np.asarray(1.0, np.float32),
        }
        restored = self._ckptr.restore(os.path.join(self.path(name), "state"), item=template)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            epoch=restored["epoch"],
            lr_scale=restored["lr_scale"],
        )
        return state, meta

    def exists(self, name: str) -> bool:
        self.wait()
        return os.path.exists(os.path.join(self.path(name), "meta.json"))
