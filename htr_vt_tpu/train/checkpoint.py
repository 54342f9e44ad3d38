"""Checkpointing with Orbax.

Reference layout (model_v1/train.py:148-211): per-eval rolling
``checkpoint_{cer:.4f}_{wer:.4f}_{iter}`` plus ``best_CER`` / ``best_WER``
copies, each carrying model + EMA + optimizer + iteration + metrics + RNG
state. Here one Orbax save of the TrainState pytree covers model/EMA/optimizer
and the *exact* JAX PRNG key. Host-side randomness needs no serialized state
at all: the loader's batch b is a pure function of (seed, b)
(data/loader.py), so restoring ``step`` resumes the exact data/augmentation
stream — stronger than the reference's four saved RNG streams, which cannot
restore the mid-epoch DataLoader position (model_v1/utils/utils.py:253-268).
"train N" == "train k, resume, train N-k" is pinned bit-exactly by
tests/test_train_loop.py::test_resume_is_stream_and_trajectory_exact.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from htr_vt_tpu.train.state import TrainState

_CKPT_RE = re.compile(r"checkpoint_(?P<cer>[\d.]+)_(?P<wer>[\d.]+)_(?P<iter>\d+)$")


def _leaf_path_set(tree) -> set:
    """Normalized leaf-path strings of a pytree, comparable across container
    flavors (dataclass attributes vs the nested dicts Orbax metadata
    returns): each path element reduces to its bare key/attr/index name."""
    def norm(entry):
        for attr in ("key", "name", "idx"):
            if hasattr(entry, attr):
                return str(getattr(entry, attr))
        return str(entry)

    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(norm(k) for k in kp) for kp, _ in flat}


class CheckpointManager:
    def __init__(self, save_dir: str, keep: int = 5):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.keep = keep
        self._ckptr = ocp.StandardCheckpointer()

    # -- paths ------------------------------------------------------------
    def _rolling_name(self, cer: float, wer: float, step: int) -> str:
        return f"checkpoint_{cer:.4f}_{wer:.4f}_{step}"

    def list_rolling(self):
        out = []
        for name in os.listdir(self.save_dir):
            m = _CKPT_RE.match(name)
            if m:
                out.append((int(m.group("iter")), name))
        return sorted(out)

    def latest_path(self) -> Optional[str]:
        rolling = self.list_rolling()
        return os.path.join(self.save_dir, rolling[-1][1]) if rolling else None

    # -- save -------------------------------------------------------------
    def save(self, state: TrainState, *, cer: float, wer: float,
             best_cer: float, best_wer: float, meta: Optional[Dict] = None) -> str:
        """Multi-host contract: EVERY process calls save() in lockstep (Orbax
        coordinates internally and only the primary host writes array data —
        gating the call to rank 0 deadlocks its _Checkpointer:save barriers).
        The file-level extras (meta.json, best_CER/best_WER copies, rolling
        cleanup) are rank-0-only inside."""
        step = int(state.step)
        name = self._rolling_name(cer, wer, step)
        path = os.path.join(self.save_dir, name)
        self._save_state(path, state, step=step, cer=cer, wer=wer,
                         best_cer=best_cer, best_wer=best_wer, meta=meta)
        if jax.process_index() == 0:
            # best_CER / best_WER copies (cheap local copytree; reference
            # saves full duplicates too, train.py:173-211).
            if cer <= best_cer:
                self._copy(path, os.path.join(self.save_dir, "best_CER"))
            if wer <= best_wer:
                self._copy(path, os.path.join(self.save_dir, "best_WER"))
            self._cleanup()
        return path

    def _save_state(self, path: str, state: TrainState, **meta_kw) -> None:
        is_main = jax.process_index() == 0
        if is_main and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            # the rmtree must land before any rank's Orbax writer enters
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("htrvt_ckpt_clear")
        self._ckptr.save(os.path.join(path, "state"), jax.device_get(state))
        self._ckptr.wait_until_finished()
        if not is_main:
            return
        meta = dict(meta_kw.pop("meta", None) or {})
        meta.update({k: v for k, v in meta_kw.items() if v is not None})
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)

    def _copy(self, src: str, dst: str) -> None:
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)

    def _cleanup(self) -> None:
        rolling = self.list_rolling()
        for _, name in rolling[:-self.keep] if self.keep > 0 else []:
            shutil.rmtree(os.path.join(self.save_dir, name), ignore_errors=True)

    # -- restore ----------------------------------------------------------
    def restore(self, path: str, template: TrainState) -> Tuple[TrainState, Dict]:
        """Restore into the structure of ``template``. Accepts a rolling dir,
        best_CER/best_WER dir, or the save_dir (-> latest). Falls back to
        parsing metrics from the directory name like the reference's filename
        convention (model_v1/utils/utils.py:246-251)."""
        path = os.path.abspath(path)  # Orbax/tensorstore requires absolute
        if os.path.basename(path) not in ("best_CER", "best_WER") and \
                not _CKPT_RE.match(os.path.basename(path)):
            latest = self.latest_path()
            if latest is None:
                raise FileNotFoundError(f"no checkpoints under {path}")
            path = latest
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(template))
        try:
            state = self._ckptr.restore(os.path.join(path, "state"), abstract)
        except Exception as e:
            # The eval template may be a strict SUBTREE of the training
            # state — e.g. an SGM-trained checkpoint (params.sgm_head is a
            # training-only head, model_sgm_2/train.py:144-158) evaluated by
            # cli/test without the SGM batch. Only that case justifies
            # retrying with partial_restore; anything else (corruption, IO,
            # shape/dtype mismatch) re-raises with the original cause. The
            # check is STRUCTURAL (template leaf paths vs the on-disk
            # checkpoint's metadata tree), not error-message sniffing —
            # Orbax rewords its messages across versions.
            try:
                md = self._ckptr.metadata(os.path.join(path, "state"))
                disk_paths = _leaf_path_set(
                    getattr(md, "item_metadata", md))
            except Exception:
                raise e
            tmpl_paths = _leaf_path_set(abstract)
            if not (tmpl_paths < disk_paths):
                raise
            import logging
            logging.getLogger("htr_vt_tpu").info(
                "strict restore failed (%s); template is a strict subtree of "
                "the checkpoint (%d of %d leaves) — retrying with "
                "partial_restore", type(e).__name__,
                len(tmpl_paths), len(disk_paths))
            with ocp.PyTreeCheckpointer() as ck:
                state = ck.restore(
                    os.path.join(path, "state"),
                    args=ocp.args.PyTreeRestore(item=abstract,
                                                partial_restore=True))
        meta: Dict[str, Any] = {}
        meta_path = os.path.join(path, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        else:
            m = _CKPT_RE.match(os.path.basename(path))
            if m:
                meta = {"cer": float(m.group("cer")), "wer": float(m.group("wer")),
                        "step": int(m.group("iter"))}
        return state, meta
