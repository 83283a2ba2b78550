"""Training metric logging backends.

(reference: osuT5/train.py:44-54 accelerate trackers with wandb/tensorboard,
LoggingConfig) wandb needs network; tensorboard event files work offline via
torch's SummaryWriter (torch-cpu ships in this image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, log_with: str = "tensorboard",
                 log_dir: str = "logs", run_name: Optional[str] = None):
        self.log_with = log_with
        self.writer = None
        if log_with == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa: PLC0415
                path = Path(log_dir) / (run_name or "run")
                self.writer = SummaryWriter(str(path))
            except ImportError:
                print("tensorboard writer unavailable; falling back to stdout")
        elif log_with == "wandb":
            try:
                import wandb  # noqa: PLC0415
                wandb.init(project="beatheritage_tpu", name=run_name)
                self.writer = wandb
            except ImportError:
                print("wandb unavailable; falling back to stdout")

    def log(self, step: int, metrics: dict) -> None:
        if self.writer is None:
            print(f"step {step}: " + " ".join(f"{k}={v:.5g}" for k, v in metrics.items()))
        elif self.log_with == "tensorboard":
            for k, v in metrics.items():
                self.writer.add_scalar(k, v, step)
        else:
            self.writer.log(metrics, step=step)

    def close(self) -> None:
        if self.writer is not None and self.log_with == "tensorboard":
            self.writer.close()
