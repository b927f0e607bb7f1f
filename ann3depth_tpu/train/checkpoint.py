"""Checkpoint save/restore via orbax (SURVEY.md §5 "Checkpoint / resume").

Parity surface with the reference's tf.train.Saver behavior [B:5]: periodic
saves of params/opt-state/step, restore-latest on start when resuming.
Async orbax saves overlap checkpoint IO with training compute.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
            # Register the handler up front: a fresh manager otherwise
            # returns item_metadata(step).tree=None until the first
            # save/restore supplies args, which _has_key relies on.
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    def save(self, step: int, state) -> None:
        """Save params/opt_state/step (the pytree leaves of TrainState);
        ema_params ride along when the trainer maintains them."""
        payload = {"step": state.step, "params": state.params,
                   "opt_state": state.opt_state}
        if getattr(state, "ema_params", None) is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(int(step), args=ocp.args.StandardSave(payload))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def delete(self, step: int):
        self._mgr.delete(step)

    def _resolve_step(self, step):
        """None -> latest; explicit step must exist (rollback resumes
        must fail loudly, not silently fall back to the newest state)."""
        if step is None:
            return self.latest_step()
        if step not in self._mgr.all_steps():
            raise ValueError(
                f"no checkpoint at step {step} in {self.dir}; "
                f"have {sorted(self._mgr.all_steps())}")
        return step

    def restore(self, state, step=None):
        """Restore into a template TrainState; returns (state, step).

        step None restores the latest; an explicit step restores that
        checkpoint (rollback/bisection resumes). If no checkpoint exists,
        returns (state, None) unchanged.
        """
        step = self._resolve_step(step)
        if step is None:
            return state, None
        template = {"step": state.step, "params": state.params,
                    "opt_state": state.opt_state}
        want_ema = getattr(state, "ema_params", None) is not None
        # StandardRestore demands an EXACT structural match with the saved
        # tree, so the template must mirror what the CHECKPOINT contains —
        # not what this run wants. --ema-decay toggled between runs would
        # otherwise hard-fail the resume in both directions.
        ckpt_has_ema = self._has_key(step, "ema_params")
        if ckpt_has_ema:
            # params-shaped by construction; restore into a params-shaped
            # template even if this run doesn't use EMA (discarded below).
            template["ema_params"] = (state.ema_params if want_ema
                                      else state.params)
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        state = state.replace(step=restored["step"], params=restored["params"],
                              opt_state=restored["opt_state"])
        if want_ema:
            if ckpt_has_ema:
                state = state.replace(ema_params=restored["ema_params"])
            else:
                # EMA newly enabled mid-training: re-seed from the restored
                # params (the average restarts at the resume point). Must
                # be a REAL copy — aliasing params would donate the same
                # buffer twice in the train step.
                state = state.replace(ema_params=jax.tree.map(
                    jax.numpy.copy, restored["params"]))
        return state, step

    def _has_key(self, step: int, key: str) -> bool:
        """Whether the saved tree at `step` contains top-level `key`."""
        try:
            meta = self._mgr.item_metadata(step)
            tree = getattr(meta, "tree", meta)
            return key in tree
        except Exception:
            return False

    def restore_params(self, state, use_ema: bool = False, step=None):
        """Restore only step+params from a checkpoint (step None = the
        latest; an explicit step pins that save — the consumers'
        --ckpt-step), whatever optimizer layout it was trained with.

        Eval/infer/export/serve need params only; a template restore would
        couple them to the trainer's opt_state structure (replicated Adam
        vs ZeRO-1's sharded flat chunks). Template-free StandardRestore
        yields the raw saved tree; params subtrees are plain dicts, so the
        tuple-vs-list metadata caveat that forces template restores for
        opt_state does not apply.

        Known tradeoff: this deserializes the whole saved tree (Adam
        moments + optional EMA ≈ 3x the param bytes) and discards the
        rest — StandardRestore rejects subset templates, and a
        transforms-based partial restore isn't worth the complexity at
        these model sizes (encdec 2M / DPT 24M params; the extra trees
        are freed on return). Revisit if checkpoints reach pod scale.
        """
        import numpy as np

        step = self._resolve_step(step)
        if step is None:
            return state, None
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore())
        params = restored["params"]
        if use_ema:
            if "ema_params" not in restored:
                raise ValueError(
                    f"checkpoint {step} in {self.dir} has no ema_params — "
                    "it was trained without ema_decay")
            params = restored["ema_params"]
        # Normalize to HOST arrays: a template-free restore re-creates the
        # trainer's saved shardings (e.g. the 4-device mesh of a
        # --grad-accum run), which need not match the consumer's mesh —
        # mixing them in one jit is an error. Host leaves are uncommitted,
        # so the consumer's jit (or an explicit replicate, loop.evaluate)
        # places them freely.
        params = jax.tree.map(np.asarray, params)
        state = state.replace(step=np.asarray(restored["step"]),
                              params=params)
        return state, step

    def restore_avg_params(self, state, k: int, use_ema: bool = False):
        """Uniform average of the params of the last k retained
        checkpoints (post-hoc SWA-style weight averaging; Izmailov et al.
        2018). Complements EMA: no training-time cost or flag, applied to
        whatever the rotation kept. Returns (state, [averaged steps]);
        state.step is pinned to the newest averaged step. Raises when
        fewer than k checkpoints exist — silently averaging fewer would
        mislabel the result.
        """
        import numpy as np

        if k < 1:
            raise ValueError(f"avg_last must be >= 1, got {k}")
        steps = self.all_steps()
        if len(steps) < k:
            raise ValueError(
                f"avg_last={k} but only {len(steps)} checkpoints are "
                f"retained in {self.dir} (steps {steps}); raise "
                "max_to_keep / checkpoint more often or lower k")
        steps = steps[-k:]
        acc = None
        for s in steps:
            st, _ = self.restore_params(state, use_ema=use_ema, step=s)
            acc = (st.params if acc is None else jax.tree.map(
                lambda a, b: a + b, acc, st.params))
        inv = 1.0 / float(len(steps))
        params = jax.tree.map(lambda a: (a * inv).astype(a.dtype), acc)
        return state.replace(step=np.asarray(steps[-1]),
                             params=params), steps

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
