"""Validation / evaluation loop.

Mirrors the reference's ``validation`` contract (model_v1/valid.py:9-77):
iterate the eval split, compute batch-mean CTC loss, greedy-decode, accumulate
CER/WER with the reference's aggregation, return
(val_loss, CER, WER, all_preds, all_labels). Runs on whatever weights the
caller passes — the train loop passes EMA weights (reference convention,
model_v1/train.py:149-153).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from htr_vt_tpu.text.converter import CTCLabelConverter
from htr_vt_tpu.text.metrics import RecognitionMetrics


def validate(eval_fn, params, batch_stats, batches, converter: CTCLabelConverter,
             sharding=None) -> Tuple[float, float, float, List[str], List[str]]:
    """eval_fn: jitted (params, batch_stats, batch) -> {pred_ids, loss}.
    batches: iterator of (batch, num_valid, texts) from data.loader.eval_batches.

    Multi-host: every process iterates the same (host-built) global batches,
    contributes its row slice to the globally sharded eval call, and
    allgathers the tiny pred_ids array back — so CER/WER (and therefore the
    train loop's best-metric decisions) are identical on every process.
    """
    nproc = jax.process_count()
    metrics = RecognitionMetrics()
    total_loss, count = 0.0, 0
    all_preds: List[str] = []
    all_labels: List[str] = []
    for batch, valid, texts in batches:
        if sharding is not None:
            if nproc > 1:
                rank = jax.process_index()
                rows = next(iter(batch.values())).shape[0]
                if rows % nproc:
                    raise ValueError(
                        f"eval batch size {rows} not divisible by process "
                        f"count {nproc}; pass a divisible --val-bs")
                batch = {k: jax.make_array_from_process_local_data(
                    sharding, v[rank * (v.shape[0] // nproc):
                                (rank + 1) * (v.shape[0] // nproc)])
                    for k, v in batch.items()}
            else:
                batch = {k: jax.device_put(v, sharding) for k, v in batch.items()}
        out = eval_fn(params, batch_stats, batch)
        pred_ids = out["pred_ids"]
        loss_rows = out.get("loss_per_sample")
        if nproc > 1:
            from jax.experimental import multihost_utils
            pred_ids = multihost_utils.process_allgather(pred_ids, tiled=True)
            if loss_rows is not None:
                loss_rows = multihost_utils.process_allgather(loss_rows,
                                                              tiled=True)
        pred_ids = np.asarray(pred_ids)[:valid]
        preds = converter.decode_batch(pred_ids)
        metrics.update(preds, texts)
        if loss_rows is not None:
            # Sum losses over the valid rows only, giving an unbiased
            # PER-SAMPLE mean. This is an intentional deviation from the
            # reference, which averages per-batch means with equal batch
            # weights (valid.py:44,74) and therefore over-weights a short
            # final batch on non-divisible splits; the two coincide exactly
            # when the split divides the batch size
            # (tests/test_validate_loss.py pins both facts).
            total_loss += float(np.asarray(loss_rows)[:valid].sum())
            count += valid
        else:  # eval fns without per-sample losses (e.g. encoder-decoder)
            total_loss += float(out["loss"])
            count += 1
        all_preds.extend(preds)
        all_labels.extend(texts)
    val_loss = total_loss / max(1, count)
    return val_loss, metrics.cer, metrics.wer, all_preds, all_labels
