"""Run reporting: result.txt append log + TensorBoard scalars + histograms
(reference trainer.py:232-233, 808-813; test.py:395-419, 465-472)."""
from __future__ import annotations

import os


class SummaryLogger:
    """TensorBoard writer when available (torch.utils.tensorboard — torch is
    host-side only here), CSV fallback otherwise."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._csv = open(os.path.join(logdir, "scalars.csv"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._csv.write(f"{step},{tag},{value}\n")
        self._csv.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._csv.close()
        if self._tb is not None:
            self._tb.close()


class ResultLog:
    """Append-only ``log/<name>/result.txt`` (reference trainer.py:808-813)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, line: str):
        with open(self.path, "a") as fp:
            fp.write(line if line.endswith("\n") else line + "\n")


def save_histograms(stats: dict, path: str):
    """Attribute histogram dashboard (reference test.py:395-419): one subplot
    per predicted attribute → ``hist.png``; raw values persisted as npz."""
    import numpy as np

    np.savez(path + ".npz", **{k: np.asarray(v) for k, v in stats.items()})
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        keys = [k for k in stats if np.asarray(stats[k]).size > 0]
        if not keys:
            return
        fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3))
        if len(keys) == 1:
            axes = [axes]
        for ax, k in zip(axes, keys):
            ax.hist(np.asarray(stats[k], np.float64).ravel(), bins=20)
            ax.set_title(k)
        fig.tight_layout()
        fig.savefig(path if path.endswith(".png") else path + ".png")
        plt.close(fig)
    except Exception:
        pass
