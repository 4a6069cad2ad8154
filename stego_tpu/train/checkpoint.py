"""Orbax checkpointing with top-k-by-mIoU retention.

Reference behavior: Lightning ModelCheckpoint(every_n_train_steps=400,
save_top_k=2, monitor="test/cluster/mIoU", mode="max")
(train_segmentation.py:487-493), with the config embedded in the checkpoint via
save_hyperparameters (:106) so eval can reconstruct the model without a config
file (eval_segmentation.py:67). Here: orbax CheckpointManager with a best_fn on
cluster mIoU; the config is stored as JSON metadata alongside each step, and the
frozen backbone is saved once per run (it never trains).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from stego_tpu.config import Config

METRIC_KEY = "test/cluster/mIoU"

# orbax 0.11's async CheckpointManager has a load-induced race between the
# metrics item write and the step-dir finalize: under heavy CPU contention the
# background commit dies with FileNotFoundError on
# ".../metrics.orbax-checkpoint-tmp/metrics" (or a TimeoutError variant on its
# signaling contract). The error surfaces at the NEXT save() /
# wait_until_finished() / close(). Saves are idempotent by step, so the
# recovery is to re-issue the last enqueued save with force=True and wait for
# it synchronously (reproduced ~1/10 full-suite runs on a shared single core;
# see CLAUDE.md "known flake").
_ORBAX_RACE_ERRORS = (FileNotFoundError, TimeoutError)


def _is_primary_process() -> bool:
    import jax

    return jax.process_index() == 0


def _single_process() -> bool:
    import jax

    return jax.process_count() == 1


class CheckpointManager:
    def __init__(self, directory: str, cfg: Config, save_top_k: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.cfg = cfg
        # every process constructs the manager (orbax multihost saves need
        # ALL jax processes inside save/wait — see train/app.py), but only
        # process 0 writes the config sidecar
        if _is_primary_process():
            with open(os.path.join(self.directory, "config.json"), "w") as f:
                f.write(cfg.to_json())
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max(1, save_top_k),
            best_fn=lambda metrics: metrics.get(METRIC_KEY, float("-inf")),
            best_mode="max",
            # async saves: the host serializes/writes in a background thread
            # while training continues (the caller hands over host arrays via
            # device_get, so donated device buffers are never aliased by an
            # in-flight save). close()/restore() barrier on completion.
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        # last successfully-enqueued managed save, kept for race recovery
        # (host pytrees only — callers device_get before saving)
        self._last_save: Optional[Tuple[int, Any, Dict[str, float]]] = None
        self._backbone_saved = os.path.exists(
            os.path.join(self.directory, "backbone")
        )
        self._backbone_thread = None
        self._backbone_error = None

    def save_backbone(self, backbone_params) -> None:
        """The frozen backbone is saved once, outside the managed steps.

        Runs in a background thread: the ~86 MB device_get can take seconds
        to minutes on a degraded tunnel, and the backbone never changes —
        training must not gate its start on it. Fetched to host FIRST inside
        the thread: handing sharded device arrays to orbax routes them
        through its replica-slice transfer, which on tunneled platforms
        degenerates to whole-buffer pulls per slice (measured 371 s vs 34 s
        for the ViT-S backbone — 11x). ``wait_until_finished``/``close``
        barrier on completion."""
        if self._backbone_saved or self._backbone_thread is not None:
            return
        import threading

        import jax

        path = os.path.join(self.directory, "backbone")

        def _save():
            # the SYNCHRONOUS checkpointer: an async StandardCheckpointer in
            # a secondary thread races the manager's async saves for orbax's
            # global signaling-contract keys (observed TimeoutError on
            # 'awaitable_signals_contract_*'); blocking inside this thread
            # is exactly the point anyway. Bounded retries: orbax's tmp-dir
            # finalize has a known load-induced race (FileNotFoundError /
            # TimeoutError under heavy CPU contention — see CLAUDE.md); the
            # backbone save is idempotent, so retrying with force=True is
            # strictly better than failing the run.
            import time

            host_params = jax.device_get(backbone_params)
            for attempt in range(3):
                try:
                    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
                    ckptr.save(path, args=ocp.args.StandardSave(host_params),
                               force=attempt > 0)
                    self._backbone_saved = True
                    self._backbone_error = None
                    return
                except BaseException as e:  # re-raised at the next join point
                    self._backbone_error = e
                    time.sleep(1.0 + attempt)

        self._backbone_thread = threading.Thread(target=_save, daemon=True)
        self._backbone_thread.start()

    def _join_backbone(self) -> None:
        t = self._backbone_thread
        if t is not None:
            t.join()
            self._backbone_thread = None
        if self._backbone_error is not None:
            e, self._backbone_error = self._backbone_error, None
            raise RuntimeError("background backbone save failed") from e

    def _check_backbone_error(self) -> None:
        """Non-blocking: surface a failed background backbone save at the
        NEXT managed checkpoint instead of only at shutdown (a full run could
        otherwise complete before learning the backbone never landed)."""
        if self._backbone_error is not None:
            e, self._backbone_error = self._backbone_error, None
            self._backbone_thread = None
            raise RuntimeError("background backbone save failed") from e

    def _replay_last_save(self) -> None:
        """Re-issue the save whose background write died in the known orbax
        race (module docstring constant ``_ORBAX_RACE_ERRORS``), synchronously
        this time. Idempotent — re-writing a step that did land is harmless."""
        if self._last_save is None:
            return
        if not _single_process():
            # the race is a single-host load artifact; a per-process replay
            # under jax.distributed would desynchronize orbax's barriers —
            # surface the error instead
            raise RuntimeError(
                "orbax async-save race recovery is single-process only")
        step, state, metrics = self._last_save
        try:
            self._mgr.save(step, args=ocp.args.StandardSave(state),
                           metrics=metrics, force=True)
            self._mgr.wait_until_finished()
        except ocp.checkpoint_manager.StepAlreadyExistsError:
            pass  # the racy save finalized after all — nothing to replay

    def save(self, step: int, state: Dict[str, Any],
             metrics: Optional[Dict[str, float]] = None) -> None:
        """Async: returns as soon as the save is enqueued; the write overlaps
        subsequent training steps (round-1 blocked the step loop on every
        save, which stalls badly on slow links)."""
        self._check_backbone_error()
        fmetrics = {k: float(v) for k, v in (metrics or {}).items()}
        try:
            self._mgr.save(step, args=ocp.args.StandardSave(state),
                           metrics=fmetrics)
        except _ORBAX_RACE_ERRORS:
            # orbax blocks here until the PREVIOUS async save finishes, so a
            # race error raised now belongs to that previous step — replay it,
            # then enqueue this one.
            self._replay_last_save()
            self._mgr.save(step, args=ocp.args.StandardSave(state),
                           metrics=fmetrics)
        self._last_save = (step, state, fmetrics)

    def wait_until_finished(self) -> None:
        self._join_backbone()
        try:
            self._mgr.wait_until_finished()
        except _ORBAX_RACE_ERRORS:
            self._replay_last_save()

    def save_preemption(self, step: int, state: Dict[str, Any],
                        metrics: Optional[Dict[str, float]] = None) -> None:
        """Unconditional synchronous save OUTSIDE the top-k ranking.

        A preemption checkpoint must survive even when its metric ranks below
        the retained set (the managed save would be garbage-collected
        immediately). Written to ``<dir>/preempt`` (overwriting any earlier
        preemption snapshot); :meth:`restore` prefers it when it is newer
        than the latest managed step."""
        self._check_backbone_error()
        try:
            self._mgr.wait_until_finished()
        except _ORBAX_RACE_ERRORS:
            self._replay_last_save()
        if self._mgr.latest_step() == step:
            return  # the managed save already captured this exact step
        path = os.path.join(self.directory, "preempt")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        if _is_primary_process():
            with open(os.path.join(self.directory, "preempt_step.json"),
                      "w") as f:
                json.dump({"step": int(step),
                           "metrics": {k: float(v)
                                       for k, v in (metrics or {}).items()}},
                          f)

    def _preempt_step(self) -> Optional[int]:
        p = os.path.join(self.directory, "preempt_step.json")
        if os.path.exists(p) and os.path.exists(
                os.path.join(self.directory, "preempt")):
            with open(p) as f:
                return int(json.load(f)["step"])
        return None

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Tuple[int, Any]:
        try:
            self._mgr.wait_until_finished()
        except _ORBAX_RACE_ERRORS:
            self._replay_last_save()
        if step is None:
            pstep = self._preempt_step()
            latest = self._mgr.latest_step()
            if pstep is not None and (latest is None or pstep > latest):
                state = ocp.StandardCheckpointer().restore(
                    os.path.join(self.directory, "preempt"), template)
                return pstep, state
            step = latest
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = self._mgr.restore(step)
        return step, state

    def restore_backbone(self, template=None):
        self._join_backbone()
        path = os.path.join(self.directory, "backbone")
        return ocp.StandardCheckpointer().restore(path, template)

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._join_backbone()
        try:
            self._mgr.wait_until_finished()
        except _ORBAX_RACE_ERRORS:
            self._replay_last_save()
        self._mgr.close()


def load_config(directory: str) -> Config:
    with open(os.path.join(os.path.abspath(directory), "config.json")) as f:
        return Config.from_dict(json.load(f))
