"""Experiment logging: the reference's human-readable per-iteration text line
(train.py:416-422, parsed downstream by Util/analysis_util.py regexes) plus a
structured JSONL stream with the same fields."""

from __future__ import annotations

import datetime
import json
import os


def readable_now() -> str:
    return datetime.datetime.now().strftime("%Y-%m-%d_%H:%M:%S")


class ExperimentLogger:
    """Writes Exp_<ts>/<ts>_training_log.out (reference format) and
    metrics.jsonl side by side."""

    def __init__(self, root: str = ".", name: str | None = None):
        ts = readable_now()
        self.exp_dir = os.path.join(root, name or f"Exp_{ts}")
        os.makedirs(self.exp_dir, exist_ok=True)
        self.sample_dir = os.path.join(self.exp_dir, "sample")
        self.ckpt_dir = os.path.join(self.exp_dir, "ckpt")
        os.makedirs(self.sample_dir, exist_ok=True)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._txt = open(os.path.join(self.exp_dir, f"{ts}_training_log.out"),
                         "a")
        self._jsonl = open(os.path.join(self.exp_dir, "metrics.jsonl"), "a")

    def write(self, text: str):
        self._txt.write(text)
        self._txt.flush()

    def log_iteration(self, iter_idx: int, train_time: float, m: dict):
        """One reference-format line + one JSON record. `m` keys: d, g,
        kd_l1_loss, kd_lpips_loss, r1, path, mean_path_avg."""
        line = (
            f"Iter #: {iter_idx} Train Time: {round(train_time, 2)}"
            f" D_Loss: {round(m.get('d', 0.0), 3)}"
            f" G_Loss: {round(m.get('g', 0.0), 3)}"
            f" KD_L1_Loss: {round(m.get('kd_l1_loss', 0.0), 3)}"
            f" KD_LPIPS_Loss: {round(m.get('kd_lpips_loss', 0.0), 3)}"
            f" D_Reg: {round(m.get('r1', 0.0), 3)}"
            f" G_Reg: {round(m.get('path', 0.0), 3)}"
            f" G_Mean_Path: {round(m.get('mean_path_avg', 0.0), 4)}\n"
        )
        self.write(line)
        rec = {"iter": iter_idx, "train_time": train_time}
        rec.update({k: float(v) for k, v in m.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_fid(self, fid: float, iter_idx: int | None = None):
        """Text line stays in the reference-scrapable format; the JSONL twin
        additionally records WHICH iteration's g_ema the score belongs to
        (the overlapped eval completes many iterations after its snapshot)."""
        self.write(f"\nEvaluated FID: {fid}\n\n")
        rec = {"fid": float(fid)}
        if iter_idx is not None:
            rec["iter"] = int(iter_idx)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log_event(self, record: dict):
        """One structured JSONL record (no reference-format twin) — used for
        run-level measurements like the input_put bandwidth probes, so the
        raw numbers behind a mode decision ship with the run."""
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def close(self):
        self._txt.close()
        self._jsonl.close()


def save_image_grid(images_nchw, path: str, nrow: int | None = None,
                    value_range=(-1.0, 1.0), padding: int = 2):
    """Save a normalized sample grid PNG (the reference uses torchvision's
    utils.save_image, train.py:428-434)."""
    import numpy as np
    from PIL import Image

    imgs = np.asarray(images_nchw)
    lo, hi = value_range
    imgs = np.clip((imgs - lo) / (hi - lo), 0.0, 1.0)
    n, c, h, w = imgs.shape
    nrow = nrow or max(1, int(n ** 0.5))
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((c, padding + ncol * (h + padding),
                     padding + nrow * (w + padding)), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[:, padding + r * (h + padding): padding + r * (h + padding) + h,
             padding + col * (w + padding): padding + col * (w + padding) + w] = imgs[i]
    arr = (grid.transpose(1, 2, 0) * 255 + 0.5).clip(0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(arr).save(path)
